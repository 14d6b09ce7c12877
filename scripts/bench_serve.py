"""Secondary benchmarks (BASELINE.md configs 1, 2, 5).

bench.py at the repo root prints the single headline metric (training
images/sec). This script measures the rest:

  1. tiling preprocessor throughput (frames/sec, host),
  2. single-tile inference latency, batch=1,
  5. end-to-end full-frame serve: 25-tile batched inference + fused
     dedup + stitch (p50 latency).

Each result prints as one JSON line.

    python scripts/bench_serve.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_tiling() -> dict:
    from livecell_tpu.data.tiling import LIVECellPreprocessor
    from tests.util_fakedata import make_fake_livecell

    src = Path(tempfile.mkdtemp())
    out = Path(tempfile.mkdtemp())
    n_frames = 8
    make_fake_livecell(src, images_per_split=(n_frames, 1, 1),
                       cells_per_image=40)
    pre = LIVECellPreprocessor(str(src), str(out),
                               total_images=int(n_frames / 0.7))
    t0 = time.perf_counter()
    pre.preprocess()
    dt = time.perf_counter() - t0
    # Count every frame the timed preprocess() actually tiled (train +
    # val + test); the r2 number divided by train frames only, under-
    # reporting by 9/7.
    done = sum(len(list((out / s / "images").glob("*.png")))
               for s in ("train", "val", "test")) / 25
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    return {"metric": "tiling_frames_per_sec",
            "value": round(done / dt, 3), "unit": "frames/sec"}


def bench_inference() -> list[dict]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from livecell_tpu.config import Config
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.serve.stitch import make_frame_predictor
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache
    from livecell_tpu.utils.profiling import time_fn

    enable_compilation_cache()
    cfg = Config()
    model, variables = create_model(cfg.model, jax.random.key(0))
    rng = np.random.default_rng(0)

    results = []

    # Config 2: single-tile inference, batch=1.
    tile = jnp.asarray(rng.uniform(size=(
        1, cfg.model.image_height, cfg.model.image_width, 3))
        .astype(np.float32))

    @jax.jit
    def infer(img):
        return model.apply(variables, img, train=False)

    t = time_fn(infer, tile, warmup=3, iters=20)
    total_ms = t["median_s"] * 1e3

    # Device-only attribution: the same graph scanned LOOPS times in one
    # dispatch (carry-fed input perturbation defeats CSE), one fetch.
    # total - device = tunnel RTT + host dispatch, the part a production
    # deployment without the tunnel would not pay.
    loops = 20

    @jax.jit
    def rep(img):
        def body(c, _):
            out = infer(img + c * 1e-9)
            return jnp.sum(out.scores).astype(jnp.float32) * 1e-20, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=loops)
        return c

    td = time_fn(rep, tile, warmup=2, iters=5)
    device_ms = td["median_s"] * 1e3 / loops
    results.append({"metric": "single_tile_inference_p50_ms",
                    "value": round(total_ms, 3), "unit": "ms",
                    "device_ms": round(device_ms, 3),
                    "rtt_ms": round(total_ms - device_ms, 3)})

    # Config 5: full-frame tiled serve (25 tiles -> detections).
    predict = make_frame_predictor(model, variables, cfg.tile)
    tiles = (rng.uniform(size=(cfg.tile.num_tiles, cfg.tile.tile_height,
                               cfg.tile.tile_width, 3)) * 255
             ).astype(np.uint8)
    predict(tiles)  # compile
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        predict(tiles)
        times.append(time.perf_counter() - t0)
    frame_ms = float(np.median(times)) * 1e3

    # Device-only share of the frame serve: scan the jitted device
    # computation (exposed as predict.device_fn) in one dispatch.
    dev_fn = predict.device_fn
    tiles_dev = jnp.asarray(tiles)
    loops = 10

    @jax.jit
    def rep_frame(t_u8):
        def body(c, _):
            outs = dev_fn(t_u8 + c)
            # ~0 at runtime, but data-dependent so XLA cannot fold the
            # loop iterations together.
            return (jnp.sum(outs[1]) * 1e-20).astype(jnp.uint8), ()
        c, _ = jax.lax.scan(body, jnp.uint8(0), None, length=loops)
        return c

    td = time_fn(rep_frame, tiles_dev, warmup=2, iters=5)
    device_ms = td["median_s"] * 1e3 / loops
    results.append({"metric": "full_frame_serve_p50_ms",
                    "value": round(frame_ms, 3), "unit": "ms",
                    "device_ms": round(device_ms, 3),
                    "host_rtt_ms": round(frame_ms - device_ms, 3)})
    return results


def bench_pipelined_serve(n_frames: int = 12) -> dict:
    """End-to-end full-frame serve, pipelined (r5 VERDICT #5): PNG tile
    decode for frame N+1 and overlay PNG encode for frame N-1 overlap
    frame N's device dispatch (livecell_tpu/serve/pipeline.py).
    Reference equivalent is fully serial per frame
    (src/visualize.py:526-563)."""
    import jax
    import numpy as np
    from PIL import Image

    from livecell_tpu.config import Config
    from livecell_tpu.models.mask_rcnn import create_model
    from livecell_tpu.serve.pipeline import run_pipelined
    from livecell_tpu.serve.stitch import load_tiles, make_frame_predictor
    from livecell_tpu.serve.visualize import visualize_with_ground_truth
    from livecell_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    model, variables = create_model(cfg.model, jax.random.key(0))
    predict = make_frame_predictor(model, variables, cfg.tile)

    # Real PNG tiles on disk: decode cost is the genuine host stage.
    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp())
    out_dir = tmp / "overlays"
    items = []
    for f in range(n_frames):
        infos = []
        for t in range(cfg.tile.num_tiles):
            arr = (rng.uniform(size=(cfg.tile.tile_height,
                                     cfg.tile.tile_width, 3)) * 255
                   ).astype(np.uint8)
            p = tmp / f"frame{f:03d}_tile_{t:02d}.png"
            Image.fromarray(arr).save(p)
            infos.append({"path": str(p), "tile_num": t,
                          "filename": p.name})
        items.append((f"frame{f:03d}", infos))

    def decode_fn(item):
        return load_tiles(item[1], cfg.tile)

    def consume_fn(item, tiles, dets):
        visualize_with_ground_truth(
            item[0], None, [], [dets], [tiles], ["Custom Model"],
            save_dir=str(out_dir), tile_cfg=cfg.tile)

    predict(decode_fn(items[0]))  # compile outside the timed region
    stats = run_pipelined(items, decode_fn, predict.dispatch, consume_fn,
                          fetch_fn=predict.fetch)
    assert not stats.errors, stats.errors
    assert len(list(out_dir.glob("*.png"))) == n_frames
    shutil.rmtree(tmp, ignore_errors=True)
    d = stats.as_dict()
    return {"metric": "pipelined_serve_fps", "value": d["pipelined_fps"],
            "unit": "frames/sec", **{k: v for k, v in d.items()
                                     if k != "pipelined_fps"}}


def main():
    out = [bench_tiling()] + bench_inference() + [bench_pipelined_serve()]
    for row in out:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
