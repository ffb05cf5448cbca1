"""Serve gaze-map inference over HTTP from an exported bundle.

    python -m recurrent_gaze_prediction_tpu.cli.export_serving \
        --train_dir /tmp/rgp --out_dir /tmp/rgp_bundle
    python -m recurrent_gaze_prediction_tpu.cli.serve \
        --bundle /tmp/rgp_bundle --port 8500

Concurrent single-clip POSTs are coalesced on-device by the dynamic
micro-batcher (`serving/server.py`). The reference has no serving
entry point (SURVEY.md section 5: inference re-runs the training code).
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

from ..utils import log


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--bundle", required=True,
                        help="directory written by cli/export_serving")
    parser.add_argument("--program", default="predict",
                        choices=["predict", "fused", "fused_int8"])
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", default=8500, type=int)
    parser.add_argument("--max_batch", default=32, type=int)
    parser.add_argument("--max_wait_ms", default=5.0, type=float)
    return parser


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)

    from ..serving import server_from_bundle

    server = server_from_bundle(
        args.bundle, program=args.program, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log.warn("interrupted; shutting down")
        server.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
