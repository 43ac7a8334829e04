"""vstnet-serve: an HTTP stylization service over the compiled pipeline.

The reference ships batch scripts only; this is the deployment-shaped
surface the TPU build adds on top of the same models (SURVEY §0: the
`project/` tier exists to productionize the research code — serving is
that tier's natural endpoint). Design points, all reused from the CLI
paths rather than re-invented:

  * styles are REGISTERED once (`PUT /styles/<name>`): the style image is
    encoded and reduced to its cWCT coloring factors
    (`cwct.style_factors[_packed]`) — shape-independent (c, c) algebra,
    so one registration serves any content resolution (the video CLI's
    factor-once trick, fixing /root/reference/video_transfer.py:195).
  * content requests pad to a 64-px shape bucket (runtime/buckets.py) and
    crop back, bounding the compile count under arbitrary client sizes
    (the reference's dynamic-shape strategy is a per-call graph rebuild,
    ggml_engine.h:473-475 — on XLA, buckets are the equivalent).
  * concurrent requests COALESCE into one device batch: a worker thread
    drains the queue for up to --batch_window_ms, groups consecutive
    same-(bucket, style) items, pads the batch to the next power of two
    (bounded executable count) and runs ONE program. Frames are
    independent (SURVEY §3.2) so batching is free throughput.
  * `--fast` serves the fused bf16 Pallas path with the packed latent;
    default is the f32 Precision.HIGHEST fidelity path.

Endpoints:
  GET  /healthz               -> JSON {mode, fast, styles, device}
  PUT  /styles/<name>         -> register style (body: image bytes)
  POST /stylize?style=<name>  -> stylized PNG (body: content image bytes)

No third-party server deps: stdlib http.server with a threading mixin.
"""

from __future__ import annotations

import io
import json
import queue
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax.numpy as jnp

from vstnet_tpu.models import cwct
from vstnet_tpu.models.pipeline import StyleModel
from vstnet_tpu.runtime.buckets import bucket_hw


def _decode_image(data: bytes, max_size: Optional[int], down_scale: int):
    """Image bytes -> float32 (1, H, W, 3) in [0, 1], reference resize
    semantics (cap longest side, floor to /4)."""
    from PIL import Image

    from vstnet_tpu.io.image import resize_pil

    img = Image.open(io.BytesIO(data)).convert("RGB")
    img = resize_pil(img, max_size, down_scale)
    return (np.asarray(img, dtype=np.uint8).astype(np.float32) / 255.0)[None]


def _encode_png(arr) -> bytes:
    from PIL import Image

    a = np.asarray(arr)
    if a.ndim == 4:
        a = a[0]
    if a.dtype != np.uint8:
        a = np.clip(a * 255.0, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(a).save(buf, format="PNG")
    return buf.getvalue()


@dataclass
class _Job:
    content: np.ndarray           # padded (1, BH, BW, 3) f32
    hw: Tuple[int, int]           # original size to crop back to
    key: Tuple[int, int, str]     # (BH, BW, style name) coalescing key
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[bytes] = None
    error: Optional[str] = None


class StyleService:
    """Model + registered styles + the coalescing batch worker."""

    def __init__(self, model: StyleModel, fast: bool = False,
                 grid: int = 64, max_size: int = 1280,
                 max_batch: int = 8, batch_window_ms: float = 5.0):
        import jax

        self.model = model
        self.fast = fast
        self.grid = grid
        self.max_size = max_size
        self.max_batch = max_batch
        self.window_s = batch_window_ms / 1000.0
        self.styles: Dict[str, Tuple] = {}   # name -> (ls, mu_s)
        # registrations come from handler threads, reads from the worker
        self._styles_lock = threading.Lock()
        # multi-chip: the batch worker runs the same sharded programs the
        # video CLI uses (frames over 'data', weights/factors replicated)
        self.n_devices = jax.local_device_count()
        self._mesh = None
        if self.n_devices > 1:
            from vstnet_tpu.parallel import (
                make_mesh,
                parallel_stylize_factored,
                parallel_stylize_fused,
            )

            self._mesh = make_mesh(self.n_devices, axes=("data",))
            if fast:
                self._fast_fn = parallel_stylize_fused(
                    self._mesh, model.cfg, out_u8=True)
            else:
                self._std_fn = parallel_stylize_factored(
                    self._mesh, model.cfg)
        self._q: "queue.Queue[_Job]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # -- style registration ------------------------------------------------
    def register_style(self, name: str, data: bytes):
        img = _decode_image(data, self.max_size, self.model.cfg.down_scale)
        x = jnp.asarray(img)
        if self.fast:
            from vstnet_tpu.models import revresnet_fast as rf

            zp = rf.encode_fast(self.model.fast_params,
                                x.astype(jnp.bfloat16), self.model.cfg,
                                packed_latent=True)
            ls, mu = cwct.style_factors_packed(
                zp, self.model.cfg.latent_channels)
        else:
            from vstnet_tpu.models.revresnet import encode

            z = encode(self.model.params, x, self.model.cfg)
            ls, mu = cwct.style_factors(z)
        # factors are (c, c)/(c, 1)-shaped device constants — tiny,
        # resolution-independent, reused by every request
        with self._styles_lock:
            self.styles[name] = (ls, mu)

    def style_names(self):
        with self._styles_lock:
            return sorted(self.styles)

    def _style_factors(self, name: str):
        with self._styles_lock:
            return self.styles[name]

    # -- request path -------------------------------------------------------
    def stylize(self, data: bytes, style: str,
                max_size: Optional[int] = None) -> bytes:
        with self._styles_lock:
            if style not in self.styles:
                raise KeyError(style)
        img = _decode_image(data, max_size or self.max_size,
                            self.model.cfg.down_scale)
        h, w = img.shape[1], img.shape[2]
        bh, bw = bucket_hw(h, w, self.grid)
        padded = np.pad(img, ((0, 0), (0, bh - h), (0, bw - w), (0, 0)),
                        mode="edge")
        job = _Job(content=padded, hw=(h, w), key=(bh, bw, style))
        self._q.put(job)
        job.done.wait()
        if job.error is not None:
            raise RuntimeError(job.error)
        return job.result

    # -- device worker -------------------------------------------------------
    def _drain_batch(self, first: Optional[_Job] = None):
        """One coalesced batch: blocking first item (or a stashed one from
        the previous drain), then same-key items for up to the batch
        window. A different key flushes (it becomes the next stash). The
        stash gets the SAME windowed wait as a fresh item — it already
        queued once, but its batch-mates may still be arriving."""
        if first is None:
            first = self._q.get()
        batch = [first]
        stash = None
        import time

        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt.key == first.key:
                batch.append(nxt)
            else:
                stash = nxt
                break
        return batch, stash

    def _stylize_batch(self, frames, style_name: str):
        ls, mu = self._style_factors(style_name)
        cfg = self.model.cfg
        if self._mesh is not None:
            # sharded over every chip (frames on 'data'); the style
            # factors were computed per-registration, style batch dim 1
            if self.fast:
                return self._fast_fn(self.model.fast_params, frames, ls, mu)
            out = self._std_fn(self.model.params, frames, ls, mu)
            return jnp.round(out.astype(jnp.float32) * 255.0
                             ).astype(jnp.uint8)
        if self.fast:
            from vstnet_tpu.models import revresnet_fast as rf

            zp = rf.encode_fast(self.model.fast_params,
                                frames.astype(jnp.bfloat16), cfg,
                                packed_latent=True)
            z_cs = cwct.transfer_with_factors_packed(
                zp, ls, mu, cfg.latent_channels)
            out = rf.decode_fast(self.model.fast_params, z_cs, cfg,
                                 packed_latent=True)
        else:
            from vstnet_tpu.models.revresnet import decode, encode

            z = encode(self.model.params, frames, cfg)
            z_cs = cwct.transfer_with_factors(z, ls, mu)
            out = decode(self.model.params, z_cs, cfg)
        out = jnp.clip(out.astype(jnp.float32), 0.0, 1.0)
        return jnp.round(out * 255.0).astype(jnp.uint8)

    def _run(self):
        stash = None
        while True:
            batch, stash = self._drain_batch(stash)
            try:
                n = len(batch)
                # pad the batch to the next power of two (one executable
                # per (bucket, pow2-batch) instead of one per batch size),
                # then up to a device-count multiple so 'data' sharding
                # always divides
                n_pad = 1
                while n_pad < n:
                    n_pad *= 2
                while n_pad % self.n_devices:
                    n_pad *= 2
                frames = np.concatenate(
                    [j.content for j in batch]
                    + [batch[0].content] * (n_pad - n), axis=0)
                if self._mesh is not None:
                    from vstnet_tpu.parallel import shard_batch

                    frames_dev = shard_batch(self._mesh, frames)
                else:
                    frames_dev = jnp.asarray(frames)
                out = np.asarray(
                    self._stylize_batch(frames_dev, batch[0].key[2]))
                for i, j in enumerate(batch):
                    h, w = j.hw
                    j.result = _encode_png(out[i, :h, :w])
                    j.done.set()
            except Exception as e:  # report, never kill the worker
                for j in batch:
                    j.error = f"{type(e).__name__}: {e}"
                    j.done.set()


def make_handler(service: StyleService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, body: bytes,
                   ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> bytes:
            n = int(self.headers.get("Content-Length", "0"))
            return self.rfile.read(n)

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                import jax

                info = {
                    "status": "ok",
                    "mode": service.model.mode,
                    "fast": service.fast,
                    "styles": service.style_names(),
                    "device": str(jax.devices()[0].platform),
                    "devices": service.n_devices,
                    "sharded": service._mesh is not None,
                    "max_batch": service.max_batch,
                }
                self._reply(200, json.dumps(info).encode())
            else:
                self._reply(404, b'{"error": "not found"}')

        def do_PUT(self):
            path = urlparse(self.path).path
            if path.startswith("/styles/") and len(path) > len("/styles/"):
                name = path[len("/styles/"):]
                try:
                    service.register_style(name, self._body())
                except Exception as e:
                    self._reply(400, json.dumps(
                        {"error": f"{type(e).__name__}: {e}"}).encode())
                    return
                self._reply(200, json.dumps({"registered": name}).encode())
            else:
                self._reply(404, b'{"error": "not found"}')

        do_POST_styles = do_PUT  # POST /styles/<name> also accepted

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path.startswith("/styles/"):
                return self.do_PUT()
            if parsed.path != "/stylize":
                self._reply(404, b'{"error": "not found"}')
                return
            q = parse_qs(parsed.query)
            style = q.get("style", [None])[0]
            if style is None or style not in service.style_names():
                self._reply(404, json.dumps(
                    {"error": f"unknown style {style!r}",
                     "styles": service.style_names()}).encode())
                return
            max_size = q.get("max_size", [None])[0]
            try:
                png = service.stylize(
                    self._body(), style,
                    max_size=int(max_size) if max_size else None)
            except Exception as e:
                self._reply(400, json.dumps(
                    {"error": f"{type(e).__name__}: {e}"}).encode())
                return
            self._reply(200, png, ctype="image/png")

    return Handler


def serve(service: StyleService, host: str = "127.0.0.1", port: int = 8790):
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    return httpd
