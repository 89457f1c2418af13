#!/bin/env python
"""Training CLI — reference-compatible surface (baseline_code/train_se.py).

Usage:  python train_se.py --config_file conf/models/BSRNN_baseline.yaml [--key value ...]

Every Config default is a flag; YAML overrides flags; train_tag derives from
the YAML basename.  Auto-resumes from the newest top-k checkpoint under
``exp/{train_tag}/{train_name}/version_{train_version}/checkpoints``.
"""

import random

import numpy as np

from urgent2026_challenge_track1_tpu.config import Config, config_parser


def main(argv=None):
    args = config_parser(argv)
    cfg = Config(**vars(args))
    cfg.read_yaml()
    print(cfg)

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    # honor cfg.device (reference parity): "cpu" forces the host platform
    # even when a TPU plugin pinned JAX_PLATFORMS (env vars alone are
    # clobbered by its sitecustomize)
    if cfg.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    # multi-host SPMD: initialize the jax distributed runtime when launched
    # under a multi-process coordinator (the TPU-native analog of the
    # reference's DDP spawn, SURVEY.md §2.8)
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        import jax

        jax.distributed.initialize()

    from urgent2026_challenge_track1_tpu.data import AudioDataModule
    from urgent2026_challenge_track1_tpu.train.trainer import Trainer

    dm = AudioDataModule(cfg)
    trainer = Trainer(cfg, dm)
    state = trainer.fit()
    return state


if __name__ == "__main__":
    main()
