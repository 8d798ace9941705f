"""AOT inference export for serving (portable StableHLO via jax.export).

Beyond-reference capability (SURVEY §2.9's inference entry is the reference's
whole serving story: re-instantiate the torch model and loop —
/root/reference/semi_seg/inference.py, bit-rotted per SURVEY §0). Here the
eval-mode forward is exported ONCE into a serialized StableHLO artifact —
parameters baked in as constants — that any JAX runtime executes WITHOUT
spcl_tpu, flax, or the model source on the serving host:

- **batch-polymorphic**: the batch dim is symbolic, so one artifact serves
  any request size (XLA compiles per concrete size on first use, cached);
- **multi-platform**: lowered for cpu+tpu in one artifact by default — export
  on a CPU build box, serve on TPU hosts;
- **self-contained**: one file = magic + JSON header (input contract, class
  count, jax/export versions) + the vhlo bytes; `load_artifact` needs only
  jax.

Input contract (matches `inference.py` / `training/steps.py` val geometry):
float32 NHWC in [0, 1] (`_as_float_image` scaling), already center-cropped /
resized by the host-side val policy. Outputs: `{"logits": f32 [b,H,W,C],
"pred": int32 [b,H,W]}` (argmax over the f32 logits, same as inference.py).
"""
from __future__ import annotations

import json
import struct
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export

_MAGIC = b"SPCLEXP1"


def build_inference_fn(model, variables):
    """Pure eval-mode forward: x [b,H,W,C] f32 -> {"logits", "pred"}.
    `variables` close over the fn and become constants of the exported
    program (a self-contained artifact; the blob carries the weights)."""

    def fn(x):
        acts = model.apply(variables, x, train=False)
        logits = acts["logits"]
        return {"logits": logits,
                "pred": jnp.argmax(logits, axis=-1).astype(jnp.int32)}

    return fn


def export_inference(model, variables, *, height: int, width: int,
                     input_dim: Optional[int] = None,
                     batch_size: Optional[int] = None,
                     platforms: Sequence[str] = ("cpu", "tpu")):
    """Export the baked-weights inference program.

    batch_size None -> symbolic batch dim ("b"): one artifact, any request
    size. An int pins the batch (slightly smaller/faster program).
    Returns a `jax.export.Exported`."""
    input_dim = int(getattr(model, "input_dim", 1) if input_dim is None
                    else input_dim)
    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b, int(height), int(width), input_dim),
                                jnp.float32)
    fn = build_inference_fn(model, variables)
    return jax_export.export(jax.jit(fn), platforms=tuple(platforms))(spec)


def save_artifact(path: str, exported, extra_meta: Optional[Dict[str, Any]] = None
                  ) -> Dict[str, Any]:
    """One-file artifact: magic | u32 header-len | JSON header | vhlo blob.
    Atomic write (training/checkpoint.py::safe_save). Returns the header."""
    from .training.checkpoint import safe_save

    blob = exported.serialize()
    in_aval = exported.in_avals[0]
    meta = {
        "format": "spcl_tpu.serving/1",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "input_shape": [str(d) for d in in_aval.shape],
        "input_dtype": str(in_aval.dtype),
        "input_contract": "float32 NHWC in [0,1], val-policy cropped",
        "outputs": ["logits f32 [b,H,W,num_classes]", "pred int32 [b,H,W]"],
        **(extra_meta or {}),
    }
    header = json.dumps(meta).encode("utf-8")
    payload = _MAGIC + struct.pack("<I", len(header)) + header + blob
    safe_save(payload, path)
    return meta


class ServedModel:
    """A deserialized artifact: `meta` header + `__call__(x)`. Needs only
    jax on the serving host — no spcl_tpu model code, no flax."""

    def __init__(self, meta: Dict[str, Any], exported):
        self.meta = meta
        self._exported = exported

    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        return self._exported.call(jnp.asarray(x, jnp.float32))


def load_artifact(path: str) -> ServedModel:
    raw = Path(path).read_bytes()
    if raw[: len(_MAGIC)] != _MAGIC:
        raise ValueError(f"{path}: not a spcl_tpu serving artifact")
    off = len(_MAGIC)
    (hlen,) = struct.unpack("<I", raw[off: off + 4])
    off += 4
    meta = json.loads(raw[off: off + hlen].decode("utf-8"))
    exported = jax_export.deserialize(raw[off + hlen:])
    return ServedModel(meta, exported)


def _prepare_input(x, meta: Dict[str, Any]):
    """Coerce a request array to the artifact's input contract.

    Accepts [H,W], [H,W,C], [B,H,W] or [B,H,W,C]; uint8 scales to [0,1]
    (the pack-time encoding, data/packing.py); floats pass through. Spatial
    dims and channel count must match the artifact; a pinned batch dim must
    match exactly. Returns (x_f32_nhwc, squeeze_batch)."""
    import numpy as np

    shape = meta["input_shape"]  # e.g. ["b", "224", "224", "1"]
    h, w, c = int(shape[1]), int(shape[2]), int(shape[3])
    x = np.asarray(x)
    squeeze = False
    if x.ndim == 2:
        x, squeeze = x[None, :, :, None], True
    elif x.ndim == 3:
        # [H,W,C] if trailing dim matches channels, else [B,H,W]
        if x.shape[-1] == c and x.shape[0] == h and x.shape[1] == w:
            x, squeeze = x[None], True
        else:
            x = x[..., None]
    if x.ndim != 4 or x.shape[1:] != (h, w, c):
        raise ValueError(f"input shape {x.shape} does not match artifact "
                         f"[b, {h}, {w}, {c}]")
    if not shape[0].isdigit():
        pass  # symbolic batch: any b
    elif x.shape[0] != int(shape[0]):
        raise ValueError(f"artifact has pinned batch {shape[0]}; got {x.shape[0]}")
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    return x.astype(np.float32, copy=False), squeeze


def make_http_server(artifact_path: str, host: str = "127.0.0.1",
                     port: int = 8000):
    """A minimal stdlib HTTP inference host over one artifact — the serving
    box needs jax + numpy only (no spcl_tpu model code; this module is
    self-contained enough to copy there).

    Endpoints:
      GET  /meta      -> artifact header JSON
      GET  /healthz   -> {"ok": true}
      POST /predict   -> body: one ``.npy`` array ([H,W], [H,W,C], [B,H,W]
                         or [B,H,W,C]; uint8 or float). Response: ``.npy``
                         int32 label map, or with ``?outputs=logits`` the
                         f32 logits, or ``?outputs=both`` an ``.npz`` with
                         both. Batch squeezed iff the request was unbatched.

    Device execution is serialized with a lock (one accelerator stream);
    the ThreadingHTTPServer keeps request parsing concurrent. Returns the
    server; call ``.serve_forever()`` (CLI: scripts/serve.py)."""
    import io
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import numpy as np

    served = load_artifact(artifact_path)
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj: Dict[str, Any]) -> None:
            self._send(code, json.dumps(obj).encode("utf-8"), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/meta":
                self._send_json(200, served.meta)
            elif path == "/healthz":
                self._send_json(200, {"ok": True})
            else:
                self._send_json(404, {"error": f"no route {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._send_json(404, {"error": f"no route {url.path}"})
                return
            outputs = parse_qs(url.query).get("outputs", ["pred"])[0]
            if outputs not in ("pred", "logits", "both"):
                self._send_json(400, {"error": f"outputs={outputs!r} not in "
                                               "pred|logits|both"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                x = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
                x, squeeze = _prepare_input(x, served.meta)
            except Exception as e:
                self._send_json(400, {"error": str(e)})
                return
            try:
                with lock:
                    out = served(x)
                res = {k: np.asarray(v)[0] if squeeze else np.asarray(v)
                       for k, v in out.items()}
            except Exception as e:
                # e.g. artifact not lowered for this host's platform —
                # report it instead of killing the connection
                self._send_json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            buf = io.BytesIO()
            if outputs == "both":
                np.savez(buf, **res)
            else:
                np.save(buf, res[outputs])
            self._send(200, buf.getvalue(), "application/octet-stream")

    server = ThreadingHTTPServer((host, port), Handler)
    server.served_model = served  # warmup/testing handle
    return server


def export_from_checkpoint(checkpoint: str, out_path: str, *, config: Dict,
                           height: int, width: int,
                           batch_size: Optional[int] = None,
                           platforms: Sequence[str] = ("cpu", "tpu"),
                           ) -> Dict[str, Any]:
    """Checkpoint (full trainer ckpt, warm start, or torch import —
    anything load_model_params reads) -> serving artifact on disk."""
    from .entry.common import build_model_from_config
    from .training.checkpoint import load_model_params

    model = build_model_from_config(config)
    sample = jnp.zeros((1, height, width, model.input_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    params, batch_stats = load_model_params(
        checkpoint, {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})})
    exported = export_inference(
        model, {"params": params, "batch_stats": batch_stats},
        height=height, width=width, batch_size=batch_size,
        platforms=platforms)
    meta = save_artifact(out_path, exported, extra_meta={
        "checkpoint": str(checkpoint),
        "num_classes": int(model.num_classes),
        "max_channel": int(model.max_channel),
    })
    return meta
