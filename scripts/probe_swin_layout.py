"""A/B the SwinUnet window-attention layout (VERDICT r4 item 2) on the
REAL cross-teaching step: UNet + SwinUnet, batch 16 @ 224^2 — the exact
bench_cross_teaching configuration. Scan-amortized (10 steps/dispatch),
fetch-forced, interleaved A/B/A/B within ONE process so tunnel drift
cannot masquerade as a win.

Layouts (args, default "windows grid"):
  windows — classic partition + qkv-5D-transpose (round-4 V0)
  grid    — transpose-free 6D einsums (measured 2x SLOWER: tiny free
            dims tile badly on the MXU)
  fused   — map-level qkv/proj; one 3C transpose replaces partition +
            qkv-transpose, one C transpose replaces out-transpose +
            reverse; attention einsums SHAPE-IDENTICAL to windows

Run: cd /tmp && python /root/repo/scripts/probe_swin_layout.py [layouts...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build(layout):
    import jax
    from cvssl_tpu.train.config import TrainConfig
    from cvssl_tpu.train.engine import Engine

    batch = 16
    cfg = TrainConfig(method="cross_teaching", model="unet",
                      model2="ViT_Seg", num_classes=4, batch_size=batch,
                      labeled_bs=8, patch_size=(224, 224), num_devices=None,
                      labeled_slices_override=8,
                      vit_kwargs={"attn_layout": layout})
    engine = Engine(cfg)
    rng = np.random.default_rng(0)
    b = {"image": rng.normal(size=(batch, 224, 224, 1)).astype(np.float32),
         "label": rng.integers(0, 4, (batch, 224, 224)).astype(np.int32),
         "idx": np.arange(batch, dtype=np.int32)}
    state = engine.init_state(jax.random.PRNGKey(0), b)
    state, m = engine.train_steps_fixed(state, b, 10)  # compile + warm
    float(m["loss"])
    return engine, state, b


def measure(engine, state, b, n=60):
    t0 = time.perf_counter()
    for _ in range(n // 10):
        state, m = engine.train_steps_fixed(state, b, 10)
    float(m["loss"])
    return (time.perf_counter() - t0) / n * 1e3, state


def main():
    from cvssl_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache("auto")
    layouts = tuple(sys.argv[1:]) or ("windows", "grid")
    sides = {}
    for layout in layouts:
        sides[layout] = build(layout)
        print(f"{layout}: compiled", flush=True)
    for rep in range(4):
        for layout in layouts:
            eng, st, b = sides[layout]
            ms, st = measure(eng, st, b)
            sides[layout] = (eng, st, b)
            sps = 16 / ms * 1e3
            print(f"rep{rep} {layout:8s} {ms:7.2f} ms/step "
                  f"({sps:6.1f} slices/s)", flush=True)


if __name__ == "__main__":
    main()
