"""Pretrain ShallowNet on SALICON (or synthetic data) and save a params
checkpoint for grafting into the gaze models.

CLI rebuild of the reference's `saliency_shallownet.py self_test`
(`/root/reference/models/saliency_shallownet.py:415-503`).
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

from ..config import OptimizerConfig
from ..data import salicon as salicon_data
from ..train.checkpoint import save_params
from ..train.saliency import fit_shallownet
from ..utils import log


class _SyntheticSaliency:
    """Image-level synthetic stand-in following the SALICON batch API."""

    def __init__(self, n: int = 256, seed: int = 0):
        from ..data import synthetic

        clips = synthetic.make_clip_windows(max(n // 8, 2), 8, seed=seed)
        self.images = clips.frames.reshape(-1, 98, 98, 3)[:n]
        self.maps = clips.gazemaps.reshape(-1, 49, 49)[:n]
        self._i = 0

    def __len__(self):
        return len(self.images)

    def next_batch(self, batch_size):
        if self._i + batch_size > len(self.images):
            self._i = 0
        sl = slice(self._i, self._i + batch_size)
        self._i += batch_size
        return self.images[sl], self.maps[sl], None


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="synthetic",
                        choices=["salicon", "synthetic"])
    parser.add_argument("--salicon_root", default="salicon")
    parser.add_argument("--out", required=True,
                        help="output params checkpoint path")
    parser.add_argument("--max_steps", default=1000, type=int)
    parser.add_argument("--batch_size", default=128, type=int)
    parser.add_argument("--learning_rate", default=3e-5, type=float)
    parser.add_argument("--compute_dtype", default=None)
    return parser


def main(argv: Optional[list[str]] = None) -> int:
    from ..utils import enable_compile_cache, honor_jax_platforms_env

    honor_jax_platforms_env()
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    import os

    if os.path.exists(args.out):
        # fail BEFORE the training run, with the remedy: orbax refuses to
        # overwrite, and discovering that after minutes of pretraining
        # (then re-running from scratch) is the expensive way to learn it
        log.warn("--out %s already exists; orbax will not overwrite. "
                 "Remove it or pick a fresh path.", args.out)
        return 1
    if args.dataset == "salicon":
        data = salicon_data.SaliconData(root=args.salicon_root,
                                        use_val_split=True).build()
        train = data.train
    else:
        train = _SyntheticSaliency()

    opt = OptimizerConfig(initial_learning_rate=args.learning_rate,
                          use_decay_schedule=False)
    params = fit_shallownet(train, opt_cfg=opt, max_steps=args.max_steps,
                            batch_size=min(args.batch_size, len(train)),
                            compute_dtype=args.compute_dtype)
    save_params(args.out, params)
    log.infov("saved pretrained ShallowNet params to %s", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
