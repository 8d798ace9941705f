#!/usr/bin/env python
"""Serve an exported artifact over HTTP (spcl_tpu/serving.py::make_http_server).

    python scripts/export_model.py runs/sp/ft/best.ckpt model.spclx --size 224
    python scripts/serve.py model.spclx --port 8000 --warmup 8

    curl -s localhost:8000/meta
    python - <<'EOF'
    import io, urllib.request, numpy as np
    x = np.random.rand(8, 224, 224, 1).astype(np.float32)
    buf = io.BytesIO(); np.save(buf, x)
    r = urllib.request.urlopen(urllib.request.Request(
        "http://localhost:8000/predict", data=buf.getvalue(), method="POST"))
    print(np.load(io.BytesIO(r.read())).shape)   # (8, 224, 224) int32 labels
    EOF

The host needs jax + numpy only — no spcl_tpu model code, flax, or torch.
`--warmup B` compiles the batch-B program before accepting traffic (the
artifact's batch dim is symbolic: each distinct request batch size compiles
once, then is cached)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("artifact")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--warmup", type=int, default=0, metavar="B",
                    help="pre-compile the batch-B program before serving")
    args = ap.parse_args(argv)

    from spcl_tpu.serving import make_http_server

    server = make_http_server(args.artifact, host=args.host, port=args.port)
    meta = server.served_model.meta
    import jax
    backend = jax.default_backend()
    if meta.get("platforms") and backend not in meta["platforms"]:
        raise SystemExit(
            f"artifact is lowered for {meta['platforms']} but this host's "
            f"jax backend is {backend!r} — re-export with --platforms "
            f"{backend} (scripts/export_model.py)")
    if args.warmup:
        import numpy as np
        shape = [int(d) if d.isdigit() else args.warmup
                 for d in meta["input_shape"]]
        server.served_model(np.zeros(shape, np.float32))
        print(f"warmed up batch={shape[0]}", flush=True)
    print(f"serving {args.artifact} ({meta.get('num_classes', '?')} classes, "
          f"input {meta['input_shape']}) on {args.host}:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
