"""vstnet-serve — HTTP stylization service (see vstnet_tpu/serve.py).

Usage:
    python -m vstnet_tpu.cli.serve --ckpoint model.pt --port 8790 --fast
    curl -X PUT  --data-binary @style.jpg localhost:8790/styles/wave
    curl -X POST --data-binary @content.jpg \
         "localhost:8790/stylize?style=wave" -o out.png
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser("vstnet-serve")
    p.add_argument("--mode", type=str, default="photorealistic",
                   choices=["photorealistic", "artistic"])
    p.add_argument("--ckpoint", type=str, default=None,
                   help="torch .pt checkpoint (random weights if omitted)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8790)
    p.add_argument("--fast", action="store_true", default=False,
                   help="fused bf16 Pallas path (packed latent)")
    p.add_argument("--max_size", type=int, default=1280)
    p.add_argument("--grid", type=int, default=64,
                   help="shape-bucket grid in pixels")
    p.add_argument("--max_batch", type=int, default=8,
                   help="coalesce up to this many concurrent requests "
                        "into one device batch")
    p.add_argument("--batch_window_ms", type=float, default=5.0,
                   help="how long a request waits for batch-mates")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from vstnet_tpu.models.pipeline import StyleModel
    from vstnet_tpu.serve import StyleService, serve

    if args.ckpoint:
        model = StyleModel.from_checkpoint(args.ckpoint, mode=args.mode)
    else:
        print("WARNING: no --ckpoint given; using random weights "
              "(smoke mode)")
        model = StyleModel.random_init(mode=args.mode)

    service = StyleService(model, fast=args.fast, grid=args.grid,
                           max_size=args.max_size,
                           max_batch=args.max_batch,
                           batch_window_ms=args.batch_window_ms)
    httpd = serve(service, host=args.host, port=args.port)
    print(f"vstnet-serve: {args.mode} ({'fused bf16' if args.fast else 'f32'})"
          f" on http://{args.host}:{args.port}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
