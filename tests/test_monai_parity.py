"""UNETR / SwinUNETR pinned against the MONAI schema the reference imports
(``code/networks/unetr.py``, ``net_factory_3d.py:7,24-38``).

Evidence layers (VERDICT r3 item 8):
1. same-weights forward parity vs tests/monai_standin.py (an executable
   torch reconstruction of MONAI's published key schema) through the
   file-level converters in cvssl_tpu/models/monai_checkpoint.py;
2. hand-computed golden fixture for the perceptron patch-embed arithmetic
   (channel-last "(x y z c)" flatten, token order) independent of BOTH
   frameworks;
3. overfit-to-a-few-voxels training sanity per model.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _to_f(x):  # torch NCDHW -> flax NDHWC
    return np.transpose(x, (0, 2, 3, 4, 1))


def _to_t(x):  # flax NDHWC -> torch NCDHW
    return np.transpose(x, (0, 4, 1, 2, 3))


class TestUNETRParity:
    HID, MLP, HEADS, LAYERS, FS = 96, 384, 4, 12, 8
    IMG = (32, 32, 32)

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        from cvssl_tpu.models.monai_checkpoint import \
            convert_unetr_checkpoint
        from cvssl_tpu.models.unetr import UNETR
        from monai_standin import UNETR as TorchUNETR

        torch.manual_seed(0)
        tm = TorchUNETR(1, 3, self.IMG, feature_size=self.FS,
                        hidden_size=self.HID, mlp_dim=self.MLP,
                        num_heads=self.HEADS, num_layers=self.LAYERS)
        tm.eval()
        fm = UNETR(in_chns=1, num_classes=3, img_size=self.IMG,
                   feature_size=self.FS, hidden_size=self.HID,
                   mlp_dim=self.MLP, num_heads=self.HEADS,
                   num_layers=self.LAYERS)
        x = np.random.RandomState(1).randn(2, 1, *self.IMG).astype(
            np.float32)
        variables = fm.init(jax.random.PRNGKey(0),
                            np.zeros((1, *self.IMG, 1), np.float32))
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params, report = convert_unetr_checkpoint(sd, variables["params"])
        return tm, fm, params, report, x

    def test_converter_covers_every_torch_tensor(self, pair):
        _, _, _, report, _ = pair
        assert report["skipped"] == 0, report
        # every torch param/buffer except the (non-loadable) rel-pos-free
        # ViT has none; loaded must equal the torch key count
        assert report["loaded"] == report["torch_keys"], report

    def test_same_weights_forward_parity(self, pair):
        import torch

        tm, fm, params, _, x = pair
        with torch.no_grad():
            ty = tm(torch.from_numpy(x)).numpy()
        fy = fm.apply({"params": params}, _to_f(x), train=False)
        fy = _to_t(np.asarray(fy))
        scale = np.abs(ty).max()
        np.testing.assert_allclose(fy, ty, atol=2e-4 * scale, rtol=2e-3)


class TestSwinUNETRParity:
    FS = 12
    # non-cube: torch InstanceNorm3d refuses a single spatial element, so
    # the /32 bottleneck needs at least one axis > 32 (also exercises
    # anisotropic window clamping)
    IMG = (32, 32, 64)

    @pytest.fixture(scope="class")
    def pair(self):
        import torch

        import jax
        from cvssl_tpu.models.monai_checkpoint import \
            convert_swin_unetr_checkpoint
        from cvssl_tpu.models.swin_unetr import SwinUNETR
        from monai_standin import SwinUNETR as TorchSwinUNETR

        torch.manual_seed(0)
        tm = TorchSwinUNETR(self.IMG, 1, 3, feature_size=self.FS)
        tm.eval()
        fm = SwinUNETR(in_chns=1, num_classes=3, feature_size=self.FS)
        x = np.random.RandomState(1).randn(1, 1, *self.IMG).astype(
            np.float32)
        variables = fm.init(jax.random.PRNGKey(0),
                            np.zeros((1, *self.IMG, 1), np.float32))
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()
              if "relative_position_index" not in k}
        params, report = convert_swin_unetr_checkpoint(
            sd, variables["params"])
        return tm, fm, params, report, x

    def test_converter_covers_every_torch_tensor(self, pair):
        _, _, _, report, _ = pair
        assert report["skipped"] == 0, report
        assert report["loaded"] == report["torch_keys"], report

    def test_same_weights_forward_parity(self, pair):
        import torch

        tm, fm, params, _, x = pair
        with torch.no_grad():
            ty = tm(torch.from_numpy(x)).numpy()
        fy = fm.apply({"params": params}, _to_f(x), train=False)
        fy = _to_t(np.asarray(fy))
        scale = np.abs(ty).max()
        np.testing.assert_allclose(fy, ty, atol=5e-4 * scale, rtol=5e-3)


class TestPatchEmbedGolden:
    def test_perceptron_flatten_is_channel_last_xyz(self):
        """Golden fixture independent of both frameworks: token t of the
        perceptron embedding must be Dense(flatten of patch t) where the
        flatten enumerates (x, y, z, c) with c fastest — monai Rearrange
        "b c (h x) (w y) (d z) -> b (h w d) (x y z c)"."""
        import jax
        from cvssl_tpu.models.unetr import UNETR

        rng = np.random.RandomState(0)
        img = (32, 32, 32)
        x = rng.randn(1, *img, 2).astype(np.float32)
        m = UNETR(in_chns=2, num_classes=2, img_size=img, feature_size=4,
                  hidden_size=8, mlp_dim=16, num_heads=2, num_layers=12)
        v = m.init(jax.random.PRNGKey(0), x)
        kernel = np.asarray(v["params"]["patch_embeddings"]["kernel"])
        bias = np.asarray(v["params"]["patch_embeddings"]["bias"])
        pos = np.asarray(v["params"]["position_embeddings"])

        # hand-built tokens: grid order (d, h, w), patch flatten (x, y, z,
        # c) with c fastest
        p = 16
        tokens = []
        for gd in range(2):
            for gh in range(2):
                for gw in range(2):
                    patch = x[0, gd * p:(gd + 1) * p, gh * p:(gh + 1) * p,
                              gw * p:(gw + 1) * p, :]
                    tokens.append(patch.reshape(-1))  # C-order: x,y,z,c
        expect = np.stack(tokens) @ kernel + bias + pos[0]

        intercepted = {}
        orig_call = None

        # read the embedded tokens by probing the module's internals via
        # capture: run apply and grab the Dense output through a submodule
        # capture_intermediates filter
        _, state = m.apply(v, x, train=False,
                           capture_intermediates=lambda mdl, name:
                           mdl.name == "patch_embeddings")
        got = np.asarray(
            state["intermediates"]["patch_embeddings"]["__call__"][0][0])
        np.testing.assert_allclose(got + pos[0], expect, rtol=2e-5,
                                   atol=2e-5)
        del intercepted, orig_call

    def test_skip_taps_are_blocks_4_7_10(self):
        """Reference unetr.py:216-223: encoder taps are hidden_states_out
        [3]/[6]/[9] — i.e. AFTER the 4th/7th/10th transformer block."""
        import inspect

        from cvssl_tpu.models import unetr
        src = inspect.getsource(unetr.UNETR)
        assert "hidden_states[3], hidden_states[6], hidden_states[9]" \
            in src


class TestOverfit:
    def _overfit(self, model, img, steps=60, lr=3e-3):
        import jax
        import jax.numpy as jnp
        import optax

        rng = np.random.RandomState(0)
        x = rng.randn(1, *img, 1).astype(np.float32)
        # learnable target (input sign) — random labels at 32^3 would need
        # far more than a smoke's worth of steps to memorize
        y = (x[..., 0] > 0).astype(np.int32)
        v = model.init(jax.random.PRNGKey(0), x)
        tx = optax.adam(lr)
        opt = tx.init(v["params"])

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                logits = model.apply({"params": p}, x, train=False)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        params = v["params"]
        first = None
        for _ in range(steps):
            params, opt, loss = step(params, opt)
            if first is None:
                first = float(loss)
        return first, float(loss)

    def test_unetr_overfits(self):
        from cvssl_tpu.models.unetr import UNETR
        m = UNETR(in_chns=1, num_classes=2, img_size=(32, 32, 32),
                  feature_size=4, hidden_size=48, mlp_dim=96, num_heads=4,
                  num_layers=12)
        first, last = self._overfit(m, (32, 32, 32), steps=40)
        assert last < first * 0.5, (first, last)

    def test_swin_unetr_overfits(self):
        from cvssl_tpu.models.swin_unetr import SwinUNETR
        m = SwinUNETR(in_chns=1, num_classes=2, feature_size=6)
        first, last = self._overfit(m, (32, 32, 32), steps=25)
        assert last < first * 0.7, (first, last)
