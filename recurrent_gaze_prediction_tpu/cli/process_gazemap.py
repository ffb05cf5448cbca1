"""Offline gaze .mat preprocessing: add multi-resolution gazemap / fixation
keys in place.

CLI rebuild of `/root/reference/process_gazemap.py:139-158`, including the
`AGENT_ID` env-var sharding (process i handles files where
i % num_agents == AGENT_ID) for manually parallel runs.
"""

from __future__ import annotations

import argparse
import os
import sys
from glob import glob
from typing import Optional

from ..data.gazemap import process_mat_file
from ..utils import log


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--glob", default="*.mat")
    parser.add_argument("--override", action="store_true",
                        help="recompute keys even if present")
    parser.add_argument("--num_agents", default=8, type=int)
    return parser


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    import h5py

    args = build_parser().parse_args(argv)
    agent_id = (int(os.environ["AGENT_ID"])
                if "AGENT_ID" in os.environ else None)

    for i, path in enumerate(sorted(glob(args.glob))):
        if agent_id is not None and i % args.num_agents != agent_id:
            continue
        log.info("[agent %s] %d %s", agent_id, i, path)
        with h5py.File(path, "r+") as mat:
            process_mat_file(mat, force=args.override)
    return 0


if __name__ == "__main__":
    sys.exit(main())
