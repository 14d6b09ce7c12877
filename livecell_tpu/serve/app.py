"""Single-image inference server.

Reference equivalent: src/app_gradio.py (Gradio Blocks UI on
0.0.0.0:7860). Differences by design:
  * the model is loaded ONCE and cached — the reference reloads the
    checkpoint from disk on every click (app_gradio.py:24),
  * inference is a cached jitted function; repeat requests are
    millisecond-scale,
  * gradio is optional: when the SDK is missing (as in this image) a
    dependency-free stdlib HTTP server serves the same functionality
    (POST an image, get back the overlay PNG + count).

Input handling: tile-sized inputs (<= 300x222 after padding) run the
single-tile path; frame-sized inputs are tiled with the standard 5x5
overlapping grid and stitched, like the offline pipeline.

    python -m livecell_tpu.serve.app --model_path models/custom.ckpt
"""

from __future__ import annotations

import argparse
import io
import os
from typing import Optional, Tuple

import numpy as np

DEFAULT_MODEL_PATH = "models/custom_maskrcnn_5epochs.ckpt"


class InferenceEngine:
    """Cached model + jitted predictors."""

    def __init__(self, model_path: str, model_type: str = "custom",
                 dets: int = 0, infer_nms: float = 0.0,
                 det_nms: float = 0.0):
        import jax

        from livecell_tpu.config import Config, apply_dense_flags
        from livecell_tpu.serve.stitch import make_frame_predictor
        from livecell_tpu.serve.visualize import load_model

        self.cfg = Config()
        mcfg = apply_dense_flags(self.cfg.model, dets, infer_nms, det_nms)
        self.cfg = self.cfg.replace(model=mcfg)
        self.model, self.variables = load_model(model_path, model_type,
                                                mcfg=mcfg)
        self.model_path = model_path
        # score_threshold 0 here: the per-request slider filters later.
        self._frame_predict = make_frame_predictor(
            self.model, self.variables, self.cfg.tile,
            score_threshold=0.0, mask_threshold=0.4,
            max_frame_dets=max(256, 4 * dets))

        import jax.numpy as jnp

        @jax.jit
        def tile_predict(image_f32):
            return self.model.apply(self.variables, image_f32[None],
                                    train=False)

        self._tile_predict = tile_predict
        self._jnp = jnp

    def predict(self, image: np.ndarray, score_threshold: float = 0.5
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """image uint8 [H, W, 3] -> (boxes, scores, masks[H,W] bool)."""
        tcfg, mcfg = self.cfg.tile, self.cfg.model
        h, w = image.shape[:2]

        if h >= tcfg.frame_height * 0.9 and w >= tcfg.frame_width * 0.9:
            # Frame-sized: overlapping 5x5 tiling + dedup stitch.
            from livecell_tpu.serve.stitch import tile_position

            tiles = np.zeros((tcfg.num_tiles, tcfg.tile_height,
                              tcfg.tile_width, 3), np.uint8)
            for t in range(tcfg.num_tiles):
                c0, r0 = tile_position(t, tcfg.tiles_per_row)
                x0 = c0 * tcfg.mini_tile_width
                y0 = r0 * tcfg.mini_tile_height
                patch = image[y0:y0 + tcfg.tile_height,
                              x0:x0 + tcfg.tile_width]
                tiles[t, :patch.shape[0], :patch.shape[1]] = patch
            dets = self._frame_predict(tiles)
            keep = dets.scores > score_threshold
            masks = np.zeros((int(keep.sum()), h, w), bool)
            for i, k in enumerate(np.nonzero(keep)[0]):
                ox, oy = dets.offsets[k].astype(int)
                m = dets.masks[k]
                y1 = min(oy + m.shape[0], h)
                x1 = min(ox + m.shape[1], w)
                masks[i, oy:y1, ox:x1] = m[:y1 - oy, :x1 - ox]
            return dets.boxes[keep], dets.scores[keep], masks

        # Tile-sized: pad/crop into the static input and run one forward.
        canvas = np.zeros((mcfg.image_height, mcfg.image_width, 3),
                          np.float32)
        ch = min(h, mcfg.image_height)
        cw = min(w, mcfg.image_width)
        canvas[:ch, :cw] = image[:ch, :cw].astype(np.float32) / 255.0

        det = self._tile_predict(self._jnp.asarray(canvas))
        boxes = np.asarray(det.boxes)[0]
        scores = np.asarray(det.scores)[0]
        valid = np.asarray(det.valid)[0]
        probs = np.asarray(det.mask_probs)[0]
        keep = valid & (scores > score_threshold)

        from livecell_tpu.ops.mask_ops import paste_masks
        import jax.numpy as jnp

        masks_full = np.asarray(paste_masks(
            jnp.asarray(probs), jnp.asarray(boxes),
            (mcfg.image_height, mcfg.image_width),
            valid=jnp.asarray(keep)))
        masks = masks_full[keep][:, :h, :w] > 0
        return boxes[keep], scores[keep], masks


def render_overlay(image: np.ndarray, boxes, scores, masks) -> np.ndarray:
    """Colored mask overlay + per-instance score labels as an RGBA image
    (reference app_gradio.py:44-72)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(12, 10))
    ax.imshow(image)
    ax.axis("off")
    if len(boxes) > 0:
        h, w = image.shape[:2]
        overlay = np.zeros((h, w, 4), np.float32)
        for idx, (mask, score) in enumerate(zip(masks, scores)):
            color = plt.cm.tab20(idx % 20)
            overlay[mask, :3] = color[:3]
            overlay[mask, 3] = 0.5
            ys, xs = np.nonzero(mask)
            if len(ys):
                ax.text(xs.mean(), ys.mean(), f"{score:.2f}", color="white",
                        fontsize=8, fontweight="bold",
                        bbox=dict(facecolor="black", alpha=0.5,
                                  edgecolor="none"))
        ax.imshow(overlay)
    fig.canvas.draw()
    out = np.array(fig.canvas.renderer.buffer_rgba())
    plt.close(fig)
    return out


_ENGINE: Optional[InferenceEngine] = None
# Dense-scene overrides from the CLI (--dets/--infer_nms/--det_nms),
# applied when the engine is (re)built.
_DENSE = {"dets": 0, "infer_nms": 0.0, "det_nms": 0.0}


def predict_single_image(image: np.ndarray, model_path: str,
                         score_threshold: float):
    """Gradio-style handler (reference app_gradio.py:18-72), with the
    engine cached across calls."""
    global _ENGINE
    if not os.path.exists(model_path):
        return image, f"Error: Model not found at {model_path}"
    try:
        if _ENGINE is None or _ENGINE.model_path != model_path:
            _ENGINE = InferenceEngine(model_path, **_DENSE)
    except Exception as e:
        return image, f"Error loading model: {e}"
    boxes, scores, masks = _ENGINE.predict(image, score_threshold)
    return render_overlay(image, boxes, scores, masks), \
        f"Detected {len(boxes)} cells."


def launch_gradio(model_path: str, port: int):
    import gradio as gr  # type: ignore

    with gr.Blocks(title="LiveCell Inference GUI") as demo:
        gr.Markdown("# Mask R-CNN Cell Detection")
        with gr.Row():
            with gr.Column():
                input_img = gr.Image(label="Input Image")
                model_path_input = gr.Textbox(
                    value=model_path, label="Path to model checkpoint")
                score_slider = gr.Slider(minimum=0.0, maximum=1.0,
                                         value=0.5, step=0.05,
                                         label="Confidence Threshold")
                run_btn = gr.Button("Run Detection", variant="primary")
            with gr.Column():
                output_img = gr.Image(label="Prediction Result")
                output_log = gr.Textbox(label="Status")
        run_btn.click(fn=predict_single_image,
                      inputs=[input_img, model_path_input, score_slider],
                      outputs=[output_img, output_log])
    demo.launch(server_name="0.0.0.0", server_port=port)


def launch_http(model_path: str, port: int):
    """Dependency-free fallback server: GET / serves an upload form;
    POST /predict?threshold=0.5 with a raw image body returns PNG."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print("[serve]", fmt % args)

        def do_GET(self):
            body = (b"<html><body><h1>LiveCell Inference</h1>"
                    b"<form method=post enctype=multipart/form-data "
                    b"action=/predict><input type=file name=image>"
                    b"<input type=submit></form></body></html>")
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path.startswith("/shutdown"):
                # Clean shutdown path: lets the process exit normally so
                # the TPU client releases its device grant (a signal kill
                # skips atexit and wedges the single-client tunnel).
                body = b"shutting down"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                import threading

                threading.Thread(target=self.server.shutdown,
                                 daemon=True).start()
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if "multipart/form-data" in ctype:
                    # crude multipart parse: find first file payload
                    boundary = ctype.split("boundary=")[-1].encode()
                    parts = raw.split(b"--" + boundary)
                    payload = None
                    for part in parts:
                        if b"\r\n\r\n" in part and b"filename=" in part:
                            payload = part.split(b"\r\n\r\n", 1)[1]
                            payload = payload.rsplit(b"\r\n", 1)[0]
                            break
                    raw = payload or raw
                img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
                from urllib.parse import parse_qs, urlparse

                q = parse_qs(urlparse(self.path).query)
                thr = float(q.get("threshold", ["0.5"])[0])
                out, status = predict_single_image(img, model_path, thr)
                buf = io.BytesIO()
                Image.fromarray(out).save(buf, format="PNG")
                data = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("X-Status", status)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception as e:
                msg = f"error: {e}".encode()
                self.send_response(500)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    print(f"Starting HTTP inference server on port {port} "
          f"(gradio unavailable)...")
    server = HTTPServer(("0.0.0.0", port), Handler)
    server.serve_forever()  # returns after POST /shutdown
    server.server_close()


def main(argv=None):
    from livecell_tpu.config import add_dense_flags

    parser = argparse.ArgumentParser(description="LiveCell inference GUI")
    parser.add_argument("--model_path", type=str,
                        default=DEFAULT_MODEL_PATH)
    parser.add_argument("--port", type=int, default=7860)
    add_dense_flags(parser)
    args = parser.parse_args(argv)
    _DENSE.update(dets=args.dets, infer_nms=args.infer_nms,
                  det_nms=args.det_nms)

    try:
        import gradio  # noqa: F401

        launch_gradio(args.model_path, args.port)
    except ImportError:
        launch_http(args.model_path, args.port)


if __name__ == "__main__":
    main()
