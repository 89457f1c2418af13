"""Config system: defaults-as-schema attribute bag with YAML + CLI override.

Keeps the public surface of the reference (``baseline_code/config.py:5-73``):
``Config(**kwargs)``, ``cfg.read_yaml()`` and ``config_parser()`` generating one
``--key value`` flag per default (with bool coercion), and ``train_tag`` derived
from the YAML basename.  Extended with the flow-matching fields that the
reference only introduces via YAML (``conf/models/BSRNN_flowse.yaml``) so that
every field is discoverable and typed from the schema.
"""

from __future__ import annotations

import argparse
import os

import yaml


class Config:
    """Flat attribute bag; defaults below define the schema.

    Mirrors reference ``baseline_code/config.py:8-38`` plus flow-matching keys.
    """

    def __init__(self, **kwargs):
        # --- optimization ---
        self.learning_rate = 1e-3
        self.batch_size = 2
        self.weight_decay = 1e-6
        self.adam_epsilon = 1e-8
        self.num_worker = 4
        self.num_train_epochs = 150
        self.device = "tpu"           # reference default "cuda"; here: jax platform
        self.num_gpu = 1              # kept for signature parity; = #devices used
        self.train_version = 0
        self.train_tag = "run_0"
        self.train_name = "baseline"
        self.val_check_interval = 50000
        self.save_top_k = 3
        self.checkpoint_metric = "val_loss"  # top-k key; reference keys on
        #                               val_loss (train_se.py:19-32), but for
        #                               flowse "val_sisnr" tracks sampler
        #                               quality where the CFM loss mis-selects
        #                               (see CheckpointIO docstring)
        self.save_last = True         # keep a "latest" ckpt for resume; the
        #                               reference's save_last=False livelocks
        #                               restart-bounded runs on a val plateau
        #                               (train_se.py:31; see CheckpointIO)
        self.resume = True
        self.seed = 1996
        self.gradient_clip = 0.5
        self.lr_step_size = 1
        self.lr_gamma = 0.85
        # --- data ---
        self.train_set_path = "none"
        self.train_set_dynamic_mixing = True
        self.dynamic_mixing_on_device = False  # render augmentation batches
        #                                        on the TPU (data/dynamic_device)
        self.valid_set_path = "none"
        self.init_from = "none"
        self.max_duration = 96000
        self.use_high_pass = True
        # --- model selection ---
        self.se_model = "bsrnn"
        self.model_type = "discriminative"  # "discriminative" | "flowse"
        self.config_file = "none"
        self.model_configs = None
        # --- flow matching (conf/models/BSRNN_flowse.yaml) ---
        self.ema_decay = 0.999
        self.theta = 1.5
        self.sigma_max = 0.5
        self.sigma_min = 0.05
        self.t_eps = 0.03
        self.T_rev = 1.0
        self.loss_type = "mse"
        self.loss_abs_exponent = 0.5
        self.n_fft = 1536
        self.hop_length = 384
        self.spec_transform_type = "exponent"
        self.spec_abs_exponent = 0.667
        self.spec_factor = 0.065
        self.bsrnn_hidden = 384
        self.num_layer = 6
        # --- TPU-specific knobs (new; no reference counterpart) ---
        self.mesh_shape = "dp=-1"     # e.g. "dp=8" or "dp=-1" (all devices)
        self.compute_dtype = "float32"  # "float32" | "bfloat16" matmul inputs
        self.length_bucket_ms = 1000  # pad batches up to multiples of this
        self.log_every_steps = 50
        # bound device run-ahead: sync on the step's loss every N steps.
        # Async dispatch otherwise queues unboundedly ahead of the device;
        # remote TPU workers (axon tunnel) crash under tens of queued
        # full-train-step executions (measured in the round-3 multi-fs soak:
        # log_every=50 crashed the worker repeatedly, per-step sync trained
        # cleanly).  Costs one host round-trip per N steps.
        self.runahead_sync_steps = 4
        self.profile_start_step = -1  # jax.profiler trace window (-1 = off)
        self.profile_num_steps = 5
        self.use_pallas_lstm = "auto"  # "auto" (TPU only) | "true" | "false":
        #                                Pallas recurrence kernels (fwd + VJP)

        self._schema_keys = frozenset(k for k in vars(self) if not k.startswith("_"))
        for k, v in kwargs.items():
            setattr(self, k, v)

    def read_yaml(self):
        """YAML override; sets train_tag from yaml basename (config.py:41-52).

        Unlike the reference (which silently accepts any key), unknown keys
        raise — the schema above is the single source of truth, and a typo'd
        YAML key becoming a dead attribute is a silent misconfiguration.
        """
        if self.config_file != "none":
            with open(self.config_file, "r", encoding="utf-8") as f:
                d = yaml.safe_load(f.read())
            unknown = sorted(set(d) - self._schema_keys)
            if unknown:
                raise ValueError(
                    f"unknown config key(s) in {self.config_file}: {unknown}; "
                    "valid keys are the Config schema attributes"
                )
            for k, v in d.items():
                setattr(self, k, v)
            self.train_tag = os.path.basename(self.config_file).replace(".yaml", "")
        return self

    def to_dict(self) -> dict:
        """Public schema fields only (JSON-serializable config snapshot)."""
        return {k: v for k, v in vars(self).items() if not k.startswith("_")}

    def __repr__(self):
        body = ",\n  ".join(
            f"{k}={v!r}" for k, v in sorted(vars(self).items()) if not k.startswith("_")
        )
        return f"Config(\n  {body}\n)"


def _str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def config_parser(argv=None):
    """Auto-generate one CLI flag per Config default (config.py:54-73)."""
    cfg = Config()
    parameters = {k: v for k, v in vars(cfg).items() if not k.startswith("_")}
    parser = argparse.ArgumentParser()
    for par, default in parameters.items():
        if isinstance(default, bool):
            typ = _str2bool
        elif default is None:
            typ = str
        else:
            typ = type(default)
        parser.add_argument(f"--{par}", type=typ, default=default)
    return parser.parse_args(argv)
