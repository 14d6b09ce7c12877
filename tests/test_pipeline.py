"""Tests for the pipelined serve driver (livecell_tpu/serve/pipeline.py).

The reference serve loop is fully serial per frame (reference
src/visualize.py:526-563); run_pipelined overlaps decode/device/overlay
across frames. These tests pin the driver's contract: ordering of
device dispatches, per-frame stage accounting, error isolation, and
actual overlap (pipelined wall < serial sum when stages sleep).
"""

from __future__ import annotations

import threading
import time

from livecell_tpu.serve.pipeline import run_pipelined


def test_processes_all_items_in_order():
    seen = []
    stats = run_pipelined(
        list(range(7)),
        decode_fn=lambda i: i * 10,
        predict_fn=lambda t: seen.append(t) or t + 1,
        consume_fn=None)
    assert seen == [i * 10 for i in range(7)]
    assert stats.frames == 7
    assert not stats.errors


def test_consume_receives_item_tiles_dets():
    got = []
    run_pipelined(
        ["a", "b"],
        decode_fn=lambda i: i + "_tiles",
        predict_fn=lambda t: t + "_dets",
        consume_fn=lambda item, tiles, dets: got.append((item, tiles, dets)))
    assert sorted(got) == [("a", "a_tiles", "a_tiles_dets"),
                           ("b", "b_tiles", "b_tiles_dets")]


def test_decode_error_skips_frame_and_records():
    def decode(i):
        if i == 1:
            raise ValueError("bad png")
        return i

    stats = run_pipelined([0, 1, 2], decode, lambda t: t, None)
    assert stats.frames == 2
    assert len(stats.errors) == 1
    assert stats.errors[0][0] == 1
    assert isinstance(stats.errors[0][1], ValueError)


def test_consume_error_recorded_not_raised():
    def consume(item, tiles, dets):
        if item == 2:
            raise RuntimeError("figure failed")

    stats = run_pipelined([1, 2, 3], lambda i: i, lambda t: t, consume)
    assert stats.frames == 3
    assert [it for it, _ in stats.errors] == [2]


def test_stages_overlap():
    """With 0.02 s decode + 0.02 s predict + 0.02 s consume per frame,
    serial time is n*0.06 s; the pipeline should land well under that
    (and the stats record per-stage attribution)."""
    n, dt = 8, 0.02

    def sleep_stage(x):
        time.sleep(dt)
        return x

    t0 = time.perf_counter()
    stats = run_pipelined(list(range(n)), sleep_stage, sleep_stage,
                          lambda *a: time.sleep(dt))
    wall = time.perf_counter() - t0
    serial = n * 3 * dt
    assert wall < serial * 0.75, (wall, serial)
    assert stats.decode_s >= n * dt * 0.9
    assert stats.device_s >= n * dt * 0.9
    assert stats.overlay_s >= n * dt * 0.9
    d = stats.as_dict()
    assert d["frames"] == n
    assert d["pipelined_fps"] > 0


def test_device_stage_single_threaded():
    """Device dispatches must stay on the caller's thread, one at a
    time (the predictor is a single jitted program; concurrent entry
    would interleave host-side tracing state)."""
    caller = threading.get_ident()
    threads = set()

    def predict(t):
        threads.add(threading.get_ident())
        return t

    run_pipelined(list(range(5)), lambda i: i, predict, None)
    assert threads == {caller}


def test_overlay_figure_builds_concurrently(tmp_path):
    """visualize_with_ground_truth must be safe on the overlay thread
    pool: it builds OO Figure/Agg objects (no pyplot current-figure
    global). Two concurrent builds -> two valid PNGs."""
    import numpy as np

    from livecell_tpu.config import TileConfig
    from livecell_tpu.serve.stitch import StitchedDetections
    from livecell_tpu.serve.visualize import visualize_with_ground_truth

    tcfg = TileConfig(frame_width=64, frame_height=48, tiles_per_image=4)
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 255, (tcfg.num_tiles, tcfg.tile_height,
                                  tcfg.tile_width, 3), dtype=np.uint8)
    masks = np.zeros((2, tcfg.tile_height, tcfg.tile_width), bool)
    masks[:, 4:12, 4:12] = True
    dets = StitchedDetections(
        boxes=np.array([[4, 4, 12, 12], [20, 20, 30, 30]], np.float32),
        scores=np.array([0.9, 0.7], np.float32),
        masks=masks,
        offsets=np.zeros((2, 2), np.int64),
        tile_nums=np.zeros(2, np.int64))

    def build(name):
        visualize_with_ground_truth(
            name, None, [], [dets], [tiles], ["m"],
            save_dir=str(tmp_path), tile_cfg=tcfg)

    stats = run_pipelined(["f0", "f1", "f2", "f3"],
                          lambda n: n, lambda n: n,
                          lambda item, tiles_, dets_: build(item))
    assert not stats.errors, stats.errors
    for n in ("f0", "f1", "f2", "f3"):
        p = tmp_path / f"{n}_GT_VS_PREDICTIONS.png"
        assert p.exists() and p.stat().st_size > 1000

def test_two_phase_fetch_double_buffers():
    """With fetch_fn, frame N+1 must be dispatched BEFORE frame N is
    fetched (double-buffered device), every handle must be fetched
    exactly once, and results must flow to consume in order."""
    events = []
    got = []

    stats = run_pipelined(
        [0, 1, 2, 3],
        decode_fn=lambda i: i,
        predict_fn=lambda t: events.append(("dispatch", t)) or ("h", t),
        consume_fn=lambda item, tiles, dets: got.append((item, dets)),
        fetch_fn=lambda h: events.append(("fetch", h[1])) or h[1] * 100)

    assert stats.frames == 4 and not stats.errors
    assert sorted(got) == [(i, i * 100) for i in range(4)]
    # dispatch(1) precedes fetch(0), dispatch(2) precedes fetch(1), ...
    for n in range(1, 4):
        assert events.index(("dispatch", n)) < events.index(("fetch", n - 1))
    assert [e for e in events if e[0] == "fetch"] == \
        [("fetch", i) for i in range(4)]


def test_fast_renderer_matches_mpl_content(tmp_path):
    """The fast (numpy+PIL) renderer must produce a valid PNG with the
    same panel count/semantics as the matplotlib path, much faster at
    LIVECell instance densities."""
    import numpy as np
    from PIL import Image

    from livecell_tpu.config import TileConfig
    from livecell_tpu.serve.render import TAB20, composite, instance_overlay
    from livecell_tpu.serve.stitch import StitchedDetections
    from livecell_tpu.serve.visualize import visualize_with_ground_truth

    # palette sanity: 20 distinct RGB rows in [0, 1]
    assert TAB20.shape == (20, 3)
    assert len({tuple(c) for c in TAB20.round(3).tolist()}) == 20

    # overlay + composite semantics: masked pixels get 50% blend of the
    # instance color, unmasked pixels pass through
    base = np.full((8, 10, 3), 200, np.uint8)
    m = np.zeros((8, 10), bool)
    m[2:4, 3:5] = True
    ov = instance_overlay([m], None, (8, 10))
    out = composite(base, ov)
    want = (200 * 0.5 + TAB20[0] * 255 * 0.5).astype(np.uint8)
    assert np.array_equal(out[2, 3], want)
    assert np.array_equal(out[0, 0], [200, 200, 200])

    tcfg = TileConfig(frame_width=64, frame_height=48, tiles_per_image=4)
    rng = np.random.default_rng(0)
    tiles = rng.integers(0, 255, (tcfg.num_tiles, tcfg.tile_height,
                                  tcfg.tile_width, 3), dtype=np.uint8)
    masks = np.zeros((2, tcfg.tile_height, tcfg.tile_width), bool)
    masks[:, 4:12, 4:12] = True
    dets = StitchedDetections(
        boxes=np.array([[4, 4, 12, 12], [20, 20, 30, 30]], np.float32),
        scores=np.array([0.9, 0.7], np.float32),
        masks=masks,
        offsets=np.zeros((2, 2), np.int64),
        tile_nums=np.zeros(2, np.int64))
    anns = [{"segmentation": [[2.0, 2.0, 10.0, 2.0, 10.0, 10.0,
                               2.0, 10.0]]}]
    orig = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)

    p = visualize_with_ground_truth(
        "fastframe", orig, anns, [dets], [tiles], ["m"],
        save_dir=str(tmp_path), tile_cfg=tcfg, renderer="fast")
    with Image.open(p) as im:
        w, h = im.size
    # two panels side by side + padding; taller than a frame (title bars)
    assert w > 2 * tcfg.frame_width and h > tcfg.frame_height
