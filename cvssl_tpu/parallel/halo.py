"""Halo-exchange spatially-sharded 3D UNet forward (SURVEY §7's
"long-context" analog): volumes too large for one chip run with one
spatial axis sharded over the mesh, convolutions exchanging 1-voxel halos
with ``lax.ppermute`` over ICI instead of materializing the full volume
anywhere.

Design (shard axis = H, NDHWC axis 2):
  - 3^3 conv: ppermute the edge planes to both neighbors, zero-fill at the
    global boundary, then a VALID conv along H — exactly SAME padding of
    the unsharded conv (``models/unet3d.py::UnetConv3``).
  - InstanceNorm: local sum/sumsq psum'd over the mesh — exact global
    statistics.
  - maxpool 2^3: local (requires the local H extent to stay even — global
    H must be divisible by 16 * n_devices).
  - trilinear x2 (align_corners=False): D/W axes resize locally; the
    sharded H axis uses the closed form out[2i] = .25 x[i-1] + .75 x[i],
    out[2i+1] = .75 x[i] + .25 x[i+1] with edge-replicated halos — exactly
    ``jax.image.resize``'s half-pixel linear kernel.

The forward consumes the UNASHARDED ``UNet3D`` param tree (same weights,
same math — eval mode), so any trained checkpoint runs sharded. Verified
on an 8-device mesh against the replicated forward (tests/test_halo.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def _halo(x, axis_name, ndev, mode):
    """Append 1-plane halos on axis 2: (B, D, h, W, C) -> (B, D, h+2, W, C).
    mode 'zero': global-boundary halos are 0 (conv SAME padding);
    mode 'edge': replicated (resize edge clamping)."""
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % ndev) for i in range(ndev)]
    bwd = [((i + 1) % ndev, i) for i in range(ndev)]
    from_left = jax.lax.ppermute(x[:, :, -1:], axis_name, fwd)
    from_right = jax.lax.ppermute(x[:, :, :1], axis_name, bwd)
    if mode == "zero":
        from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
        from_right = jnp.where(idx == ndev - 1,
                               jnp.zeros_like(from_right), from_right)
    else:
        from_left = jnp.where(idx == 0, x[:, :, :1], from_left)
        from_right = jnp.where(idx == ndev - 1, x[:, :, -1:], from_right)
    return jnp.concatenate([from_left, x, from_right], axis=2)


def _conv3(x, kernel, bias, axis_name, ndev):
    """SAME 3^3 conv with the H axis sharded (halo + VALID on H)."""
    xh = _halo(x, axis_name, ndev, "zero")
    y = jax.lax.conv_general_dilated(
        xh, kernel, (1, 1, 1),
        padding=[(1, 1), (0, 0), (1, 1)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + bias


def _conv1(x, kernel, bias):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias


def _instance_norm(x, axis_name, eps=1e-5):
    """Exact global instance norm: statistics psum'd over the shards."""
    axes = (1, 2, 3)
    n_local = x.shape[1] * x.shape[2] * x.shape[3]
    s = jax.lax.psum(jnp.sum(x, axes), axis_name)        # (B, C)
    ss = jax.lax.psum(jnp.sum(jnp.square(x), axes), axis_name)
    n = jax.lax.psum(jnp.float32(n_local), axis_name)
    mean = s / n
    var = ss / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean[:, None, None, None, :]) * inv[:, None, None, None, :]


def _up_x2(x, axis_name, ndev):
    """Trilinear x2 (half-pixel): local resize on D/W (measured faster
    than the elementwise 2-tap form — models/unet3d.py::_up2_axis
    docstring), halo 2-tap form on H (the cross-shard axis can't go
    through resize)."""
    b, d, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * d, h, 2 * w, c), "trilinear")
    xh = _halo(x, axis_name, ndev, "edge")
    xm1, x0, xp1 = xh[:, :, :h], xh[:, :, 1:h + 1], xh[:, :, 2:h + 2]
    even = 0.25 * xm1 + 0.75 * x0
    odd = 0.75 * x0 + 0.25 * xp1
    out = jnp.stack([even, odd], axis=3)
    return out.reshape(b, 2 * d, 2 * h, 2 * w, c)


def _maxpool(x):
    from flax import linen as nn
    return nn.max_pool(x, (2, 2, 2), (2, 2, 2))


def sharded_unet3d_forward(variables, image, mesh: Mesh):
    """Eval-mode ``UNet3D`` forward with the H axis sharded over ``mesh``.

    ``variables``: the standard (unsharded) UNet3D variables;
    ``image``: (B, D, H, W, 1) with H % (16 * n_devices) == 0.
    Returns logits (B, D, H, W, num_classes), H-sharded on device, fetched
    to host as one array.
    """
    params = variables["params"]
    axis = mesh.axis_names[0]
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert image.shape[2] % (16 * ndev) == 0, (
        f"H={image.shape[2]} must divide 16*n_devices={16 * ndev} so every "
        "maxpool level keeps an even local extent")

    relu = jax.nn.relu

    def conv_block(p, x):
        x = _conv3(x, p["Conv_0"]["kernel"], p["Conv_0"]["bias"], axis, ndev)
        x = relu(_instance_norm(x, axis))
        x = _conv3(x, p["Conv_1"]["kernel"], p["Conv_1"]["bias"], axis, ndev)
        return relu(_instance_norm(x, axis))

    def body(params, x):
        conv1 = conv_block(params["UnetConv3_0"], x)
        conv2 = conv_block(params["UnetConv3_1"], _maxpool(conv1))
        conv3 = conv_block(params["UnetConv3_2"], _maxpool(conv2))
        conv4 = conv_block(params["UnetConv3_3"], _maxpool(conv3))
        center = conv_block(params["UnetConv3_4"], _maxpool(conv4))

        def up(p, skip, below):
            u = _up_x2(below, axis, ndev)
            return conv_block(p["UnetConv3_0"],
                              jnp.concatenate([skip, u], axis=-1))

        h = up(params["UnetUp3CT_0"], conv4, center)
        h = up(params["UnetUp3CT_1"], conv3, h)
        h = up(params["UnetUp3CT_2"], conv2, h)
        h = up(params["UnetUp3CT_3"], conv1, h)
        return _conv1(h, params["Conv_0"]["kernel"], params["Conv_0"]["bias"])

    run = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(), P(None, None, axis)),
        out_specs=P(None, None, axis)))
    image = jax.device_put(
        jnp.asarray(image, jnp.float32),
        NamedSharding(mesh, P(None, None, axis)))
    return run(params, image)
