"""Training system: jitted SPMD train/val steps, EMA, NaN guards, checkpoints.

Behavioral spec: the reference's Lightning modules —
``SEModel`` (``/root/reference/baseline_code/d_model.py``): MR-L1 loss +
monitored SI-SNR (incl. per-fs key), weighted grad-norm telemetry, NaN-loss
skip and NaN-grad zeroing, AdamW(eps, wd) + per-epoch StepLR(gamma), grad
clip 0.5; ``FlowSEModel`` (``flow_model.py``): CFM loss, EMA(0.999) updated
after each optimizer step, EMA weights swapped in for eval; trainer assembly
(``train_se.py``): top-k val_loss checkpoints every ``val_check_interval``
steps, newest-checkpoint auto-resume.

TPU-native design:
  * the whole step (forward, loss, backward, clip, NaN guard, update, EMA,
    metrics) is ONE jitted program per (model_kind, fs, T, B) signature;
    the NaN-grad guard is a `jnp.where` on gradient finiteness instead of a
    host-side check, so it costs nothing;
  * data parallelism: batches are placed with a `dp` NamedSharding, params
    replicated — XLA emits the gradient all-reduce (no DDP machinery);
  * LR schedule: optax.inject_hyperparams lets the per-epoch StepLR value be
    set without recompilation;
  * checkpoints: orbax CheckpointManager, top-k on val_loss + auto-resume,
    storing params, opt state, EMA, step/epoch and config.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from urgent2026_challenge_track1_tpu.config import Config
from urgent2026_challenge_track1_tpu.dsp.stft import STFTConfig
from urgent2026_challenge_track1_tpu.models import bsrnn as bsrnn_mod
from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as flow_mod
from urgent2026_challenge_track1_tpu.parallel import make_mesh, replicated, shard_batch
from urgent2026_challenge_track1_tpu.train import losses

__all__ = ["TrainState", "Trainer", "make_optimizer", "build_model"]


# ---------------------------------------------------------------------------
# Model assembly from Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    kind: str  # "discriminative" | "flowse"
    model_cfg: Any
    stft_cfg: STFTConfig


def _resolve_use_pallas(cfg: Config) -> bool:
    """"auto" enables the Pallas recurrence kernels only on TPU backends
    (the kernels have no CPU/GPU lowering outside interpret mode)."""
    v = str(getattr(cfg, "use_pallas_lstm", "auto")).lower()
    if v == "auto":
        return jax.default_backend() == "tpu"
    if v in ("true", "1", "yes"):
        return True
    if v in ("false", "0", "no"):
        return False
    # fail fast like unknown config keys do — a typo here would silently
    # train a multi-hour run on the slow scan path
    raise ValueError(
        f"use_pallas_lstm={cfg.use_pallas_lstm!r}: expected auto/true/false"
    )


def build_model(cfg: Config) -> ModelBundle:
    use_pallas = _resolve_use_pallas(cfg)
    if cfg.model_type == "flowse":
        fcfg = flow_mod.FlowSEConfig(
            n_fft=cfg.n_fft,
            hop_length=cfg.hop_length,
            spec_abs_exponent=cfg.spec_abs_exponent,
            spec_factor=cfg.spec_factor,
            bsrnn_hidden=cfg.bsrnn_hidden,
            num_layer=cfg.num_layer,
            sigma_min=cfg.sigma_min,
            sigma_max=cfg.sigma_max,
            t_eps=cfg.t_eps,
            T_rev=cfg.T_rev,
            loss_type=cfg.loss_type,
            compute_dtype=cfg.compute_dtype,
            use_pallas_lstm=use_pallas,
        )
        return ModelBundle("flowse", fcfg, fcfg.stft_cfg)
    model_configs = cfg.model_configs or {}
    mcfg = bsrnn_mod.BSRNNConfig(
        input_dim=481,
        num_channel=model_configs.get("num_channel", 192),
        num_layer=model_configs.get("num_layer", 6),
        # reference model_configs feed BSRNNSeparator kwargs, which include
        # `causal` (reference models/bsrnn.py:33); streaming_norm is the
        # TPU-framework extension that makes a causal model deployable as a
        # real-time stream (models/streaming_causal.py)
        causal=bool(model_configs.get("causal", False)),
        streaming_norm=bool(model_configs.get("streaming_norm", False)),
        compute_dtype=cfg.compute_dtype,
        use_pallas_lstm=use_pallas,
    )
    return ModelBundle("discriminative", mcfg, STFTConfig(n_fft=960, hop_length=480))


def init_params(key, bundle: ModelBundle):
    if bundle.kind == "flowse":
        return flow_mod.init_flowse(key, bundle.model_cfg)
    return bsrnn_mod.init_bsrnn(key, bundle.model_cfg)


# ---------------------------------------------------------------------------
# Optimizer (AdamW + per-epoch StepLR via injected hyperparams)
# ---------------------------------------------------------------------------


def _frozen_mask(params):
    """True for non-trainable leaves: the Gaussian-Fourier projection W is a
    fixed buffer in the reference (models/bsrnn_flowse.py:95,
    requires_grad=False)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) == "t_proj_w" for k in path
        ),
        params,
    )


def make_optimizer(cfg: Config):
    opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.gradient_clip),
            optax.adamw(
                learning_rate,
                eps=cfg.adam_epsilon,
                weight_decay=cfg.weight_decay,
            ),
            # zero updates (incl. weight decay) for frozen buffers
            optax.masked(optax.set_to_zero(), _frozen_mask),
        )
    )(learning_rate=cfg.learning_rate)
    return opt


def lr_for_epoch(cfg: Config, epoch: int) -> float:
    """StepLR: lr * gamma^(epoch // step_size)  (d_model.py:108-113)."""
    return cfg.learning_rate * cfg.lr_gamma ** (epoch // cfg.lr_step_size)


# ---------------------------------------------------------------------------
# Train state
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    ema_params: Any  # flow only (None otherwise)
    step: int
    epoch: int
    batch_in_epoch: int = 0  # loader position for mid-epoch resume


def _weighted_grad_norm(grads):
    """Reference Grad_norm: sum(||g_p|| * numel(p)) / sum(numel) (d_model.py:39-45)."""
    leaves = jax.tree.leaves(grads)
    total = sum(jnp.linalg.norm(g.reshape(-1)) * g.size for g in leaves)
    n = sum(g.size for g in leaves)
    return total / (n + 1e-5)


def _zero_nonfinite(grads):
    """NaN-grad guard: if ANY grad is non-finite, zero ALL grads (skip step)."""
    flat = jax.tree.leaves(grads)
    bad = jnp.any(jnp.stack([jnp.any(~jnp.isfinite(g)) for g in flat]))
    grads = jax.tree.map(lambda g: jnp.where(bad, jnp.zeros_like(g), g), grads)
    return grads, bad


# ---------------------------------------------------------------------------
# Jitted steps (cached per (kind, fs, shape))
# ---------------------------------------------------------------------------


def _make_loss_and_metrics(bundle: ModelBundle, fs: int, constrain=None):
    def loss_and_metrics(params, key, clean, noisy, lengths):
        if bundle.kind == "flowse":
            loss = flow_mod.flowse_loss(
                params, bundle.model_cfg, key, clean, noisy, fs,
                lengths=lengths, constrain=constrain,
            )
            return loss, {}
        wav, _ = bsrnn_mod.bsrnn_se_apply(
            params, bundle.model_cfg, bundle.stft_cfg, noisy, fs,
            lengths=lengths, constrain=constrain,
        )
        loss = losses.multi_res_l1_spec_loss(clean, wav, lengths).mean()
        # NaN-loss skip (d_model.py:75-77): zero the loss contribution.  A
        # constant 0.0 fallback, NOT wav.mean()*0.0 — when wav itself holds
        # the NaN, NaN*0.0 is NaN and the guard would be dead in exactly the
        # case it targets (grads are additionally guarded downstream).
        loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
        sisnr = jax.lax.stop_gradient(losses.si_snr(clean, wav, lengths).mean())
        return loss, {"sisnr": sisnr}

    return loss_and_metrics


def _step_core(loss_and_metrics, optimizer, ema_decay):
    """Shared step body: grad, telemetry, TRUE-skip NaN guard, update, EMA.

    NaN-guard design (semantics of the reference's Lightning guard, which
    skips optimizer.step() entirely, d_model.py:36-59): a single per-leaf
    sum-of-squares pass feeds BOTH the weighted grad-norm telemetry and the
    finiteness flag — any non-finite gradient element makes its leaf norm
    (and hence the weighted norm) non-finite, so ``bad`` needs no separate
    stacked isfinite reduction.  Grads are NOT pre-zeroed; NaNs may flow
    into the optimizer's candidate update, which is discarded wholesale by
    gating params AND opt state back to their previous values.  (An
    all-finite gradient whose global norm overflows f32 — |g| > ~2e19 —
    also flags ``bad``; such a step is unusable anyway.)"""

    def core(params, opt_state, ema_params, key, clean, noisy, lengths):
        (loss, extra), grads = jax.value_and_grad(loss_and_metrics, has_aux=True)(
            params, key, clean, noisy, lengths
        )
        leaves = jax.tree.leaves(grads)
        sumsq = [jnp.sum(jnp.square(g.astype(jnp.float32))) for g in leaves]
        n = sum(g.size for g in leaves)
        # reference Grad_norm: sum(||g_p|| * numel(p)) / sum(numel)
        # (d_model.py:39-45)
        gnorm = sum(jnp.sqrt(s) * g.size for s, g in zip(sumsq, leaves)) / (n + 1e-5)
        bad = ~jnp.isfinite(gnorm)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        params = jax.tree.map(
            lambda old, new: jnp.where(bad, old, new), params, new_params
        )
        opt_state = jax.tree.map(
            lambda old, new: jnp.where(bad, old, new), opt_state, new_opt_state
        )
        if ema_params is not None:
            ema_params = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema_params, params
            )
        metrics = {"loss": loss, "grad_norm": gnorm, "nan_grad": bad, **extra}
        return params, opt_state, ema_params, metrics

    return core


def make_train_step(bundle: ModelBundle, optimizer, cfg: Config, fs: int,
                    constrain=None):
    """Returns jitted (params, opt_state, ema, key, clean, noisy, lengths)
    -> updated + metrics.  All loss/metric statistics are length-masked so
    the static bucket padding never leaks into the numerics (reference
    computes on exact batch-max-length signals, d_model.py:61-89).

    ``constrain`` (parallel.model_parallel.row_constrainer) shards the
    dual-path recurrence rows over a dp x mp mesh for model-parallel
    training — activations (the ~14 GB @ B=2 bottleneck,
    conf/models/BSRNN_baseline.yaml:11) split across chips while params
    stay replicated; the backward pass inherits the same shardings."""
    core = _step_core(
        _make_loss_and_metrics(bundle, fs, constrain), optimizer, cfg.ema_decay
    )
    # donate params/opt/ema buffers: the update happens in place on device,
    # halving peak parameter memory
    return jax.jit(core, donate_argnums=(0, 1, 2))


# DeviceRenderBatch key order consumed by the fused rendered train step
RENDER_KEYS = (
    "speech", "noise", "rir", "snr_db", "use_rir", "clip_lo", "clip_hi",
    "packet_mask", "bw_mask", "aug_order", "prerendered_mask", "clean_pre",
    "noisy_pre", "lengths",
)


def make_train_step_rendered(bundle: ModelBundle, optimizer, cfg: Config,
                             fs: int, constrain=None):
    """Fused on-device dynamic mixing + training: ONE jitted program renders
    the augmentation batch (simulation/jax_dsp.render_batch) and immediately
    trains on it.

    TPU-first rationale: a separate render dispatch pays the remote-tunnel
    dispatch floor (~30-40 ms, multistream_r4.json) and an extra
    HBM round-trip for the rendered pair every step; fusing makes the
    device-DM step's overhead the render FLOPs only (train_supply_r5.json
    A/B).  Signature: (params, opt_state, ema, key, *RENDER_KEYS arrays) ->
    same outputs as make_train_step."""
    from urgent2026_challenge_track1_tpu.simulation.jax_dsp import render_batch

    core = _step_core(
        _make_loss_and_metrics(bundle, fs, constrain), optimizer, cfg.ema_decay
    )
    highpass = bool(cfg.use_high_pass)

    def step(params, opt_state, ema_params, key, speech, noise, rir, snr_db,
             use_rir, clip_lo, clip_hi, packet_mask, bw_mask, aug_order,
             pre_mask, clean_pre, noisy_pre, lengths):
        target, noisy = render_batch(
            speech, noise, rir, snr_db, use_rir, clip_lo, clip_hi,
            packet_mask, bw_mask, fs=fs, highpass=highpass, lengths=lengths,
            aug_order=aug_order,
        )
        m = pre_mask[:, None]
        target = (1 - m) * target + m * clean_pre
        noisy = (1 - m) * noisy + m * noisy_pre
        return core(params, opt_state, ema_params, key, target, noisy, lengths)

    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_val_step(bundle: ModelBundle, cfg: Config, fs: int, constrain=None):
    @jax.jit
    def step(params, key, clean, noisy, lengths):
        if bundle.kind == "flowse":
            loss = flow_mod.flowse_loss(
                params, bundle.model_cfg, key, clean, noisy, fs,
                lengths=lengths, constrain=constrain,
            )
            return {"loss": loss}
        wav, _ = bsrnn_mod.bsrnn_se_apply(
            params, bundle.model_cfg, bundle.stft_cfg, noisy, fs,
            lengths=lengths, constrain=constrain,
        )
        loss = losses.multi_res_l1_spec_loss(clean, wav, lengths).mean()
        sisnr = losses.si_snr(clean, wav, lengths).mean()
        return {"loss": loss, "sisnr": sisnr}

    return step


# ---------------------------------------------------------------------------
# Checkpointing (orbax)
# ---------------------------------------------------------------------------


class CheckpointIO:
    """Top-k on val_loss + auto-resume (reference train_se.py:19-32,67-72).

    Beyond reference parity (which sets ``save_last=False`` and resumes from
    the newest best-val_loss checkpoint, train_se.py:31,67-70), this keeps ONE
    "latest" checkpoint in a sibling ``<directory>_last`` tree: when val_loss
    plateaus, the top-k manager garbage-collects every newer save, so a
    restart-bounded run (the TPU-tunnel RSS leak forces periodic restarts —
    CLAUDE.md) would livelock resuming the same old best step forever.  Resume
    picks the highest step across both trees.  Set ``save_last=False`` for
    strict reference behavior.

    ``metric`` selects the top-k key (default ``val_loss`` = reference
    behavior).  For flowse the CFM objective is a poor selector of sampler
    quality — in the round-5 reference-geometry soak val_loss bottomed at
    step ~6k while the N=10 sampler's val SI-SNR kept improving through
    25k — so ``metric="val_sisnr"`` (mode auto-flips to max) keys retention
    on the quantity users actually care about.
    """

    def __init__(self, directory: str, save_top_k: int = 3,
                 save_last: bool = True, metric: str = "val_loss",
                 mode: Optional[str] = None):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.metric = metric
        self.mode = mode or ("max" if "sisnr" in metric else "min")
        os.makedirs(self.directory, exist_ok=True)
        # Checkpoints saved before a checkpoint_metric switch lack the new
        # key in their metrics dict; orbax's preservation policy evaluates
        # best_fn on EVERY retained checkpoint at the next save, so a plain
        # m[self.metric] KeyError-crashes the first save after resume
        # (observed: round-5 refgeom soak resuming a val_loss-keyed run with
        # metric="val_sisnr").  Missing metric ranks as worst-possible.
        _worst = float("inf") if self.mode == "min" else float("-inf")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=lambda m: m.get(self.metric, _worst),
            best_mode=self.mode,
            create=True,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)
        self.last_manager = None
        if save_last:
            self.last_manager = ocp.CheckpointManager(
                self.directory.rstrip(os.sep) + "_last",
                options=ocp.CheckpointManagerOptions(max_to_keep=1, create=True),
            )

    def _composite_save(self, state: TrainState, val_loss, config_dict,
                        metrics=None):
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": state.epoch,
            "batch_in_epoch": state.batch_in_epoch,
        }
        if state.ema_params is not None:
            payload["ema"] = state.ema_params
        meta = {"val_loss": float(val_loss), "config": config_dict}
        if metrics:
            # additive: lets scripts/average_checkpoints.py rank by the
            # configured metric; legacy readers only touch meta["val_loss"]
            meta["metrics"] = {k: float(v) for k, v in metrics.items()}
        return self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(payload),
            meta=self._ocp.args.JsonSave(meta),
        )

    def save(self, step: int, state: TrainState, val_loss, config_dict: dict):
        """``val_loss``: the val_loss float (legacy), or the full val-metrics
        dict — required when ``metric != "val_loss"`` so best_fn can see it.
        A missing metric value ranks as worst-possible, never as best."""
        vm = dict(val_loss) if isinstance(val_loss, dict) else \
            {"val_loss": float(val_loss)}
        worst = float("inf") if self.mode == "min" else float("-inf")
        metrics = {"val_loss": float(vm.get("val_loss", worst))}
        metrics[self.metric] = float(vm.get(self.metric, worst))
        val_loss = metrics["val_loss"]  # meta JSON keeps its legacy shape
        self.manager.save(
            step,
            args=self._composite_save(state, val_loss, config_dict, metrics),
            metrics=metrics,
        )
        self.manager.wait_until_finished()
        if self.last_manager is not None:
            self.last_manager.save(
                step,
                args=self._composite_save(state, val_loss, config_dict, metrics),
            )
            self.last_manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        steps = [self.manager.latest_step()]
        if self.last_manager is not None:
            steps.append(self.last_manager.latest_step())
        steps = [s for s in steps if s is not None]
        return max(steps) if steps else None

    def restore(self, step: int, template_state: TrainState) -> tuple[TrainState, dict]:
        payload = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": 0,
            "epoch": 0,
            "batch_in_epoch": 0,
        }
        if template_state.ema_params is not None:
            payload["ema"] = template_state.ema_params
        manager = self.manager
        if step not in self.manager.all_steps() and self.last_manager is not None:
            manager = self.last_manager
        restored = manager.restore(
            step,
            args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore(payload),
                meta=self._ocp.args.JsonRestore(),
            ),
        )
        st = restored["state"]
        state = TrainState(
            params=st["params"],
            opt_state=st["opt_state"],
            ema_params=st.get("ema"),
            step=int(st["step"]),
            epoch=int(st["epoch"]),
            batch_in_epoch=int(st.get("batch_in_epoch", 0)),
        )
        return state, restored["meta"]


# ---------------------------------------------------------------------------
# Metrics logging (JSONL always; TensorBoard when torch is importable)
# ---------------------------------------------------------------------------


class MetricsLogger:
    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a", encoding="utf-8")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, step: int, metrics: dict):
        rec = {"step": step, "time": time.time()}
        # RFC-JSON: inf/nan (e.g. val_loss=inf from an empty val pass, NaN
        # grad_norm on a guarded step) would serialize as bare Infinity/NaN
        # tokens that strict JSONL consumers (jq, pandas) reject
        rec.update({
            k: (float(v) if math.isfinite(float(v)) else None)
            for k, v in metrics.items()
        })
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------


class Trainer:
    def __init__(self, cfg: Config, datamodule):
        # persistent compilation cache: restarts/resumes skip recompiling the
        # per-(fs, shape) programs (multi-minute on remote TPU backends)
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass
        if cfg.compute_dtype == "bfloat16":
            try:
                backend = jax.default_backend()
            except Exception:
                backend = "unknown"
            if backend == "cpu":
                # XLA:CPU's thunk runtime rejects BF16xBF16=F32 dots; bf16 is
                # a TPU fast path, so fall back rather than crash
                import warnings

                warnings.warn(
                    "compute_dtype=bfloat16 is unsupported on the CPU backend; "
                    "falling back to float32"
                )
                cfg.compute_dtype = "float32"
        self.cfg = cfg
        self.dm = datamodule
        self.bundle = build_model(cfg)
        self.mesh = make_mesh(cfg.mesh_shape)
        # model-parallel training (mesh_shape="dp=2,mp=4"): shard the
        # dual-path recurrence rows over dp x mp so activation memory (the
        # reference's ~14 GB @ batch 2) splits across chips.  The sharded
        # program uses the XLA scan recurrence — a Pallas kernel inside a
        # GSPMD-partitioned program would need a manual shard_map wrapper
        # (parallel/model_parallel.py docstring).
        self._constrain = None
        mesh_axes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        if mesh_axes.get("mp", 1) > 1:
            from urgent2026_challenge_track1_tpu.parallel.model_parallel import (
                row_constrainer,
            )

            self._constrain = row_constrainer(self.mesh)
            if getattr(self.bundle.model_cfg, "use_pallas_lstm", False):
                import warnings

                warnings.warn(
                    "mp>1 mesh: forcing use_pallas_lstm=False (scan "
                    "recurrence) for the GSPMD-partitioned train step"
                )
                self.bundle = dataclasses.replace(
                    self.bundle,
                    model_cfg=dataclasses.replace(
                        self.bundle.model_cfg, use_pallas_lstm=False
                    ),
                )
        self.optimizer = make_optimizer(cfg)
        self.exp_dir = os.path.join(
            "exp", cfg.train_tag, cfg.train_name, f"version_{cfg.train_version}"
        )
        self.logger = MetricsLogger(self.exp_dir)
        self.ckpt = CheckpointIO(
            os.path.join(self.exp_dir, "checkpoints"), cfg.save_top_k,
            save_last=getattr(cfg, "save_last", True),
            metric=getattr(cfg, "checkpoint_metric", "val_loss"),
        )
        self._train_steps = {}
        self._val_steps = {}

    # -- state -------------------------------------------------------------

    def init_state(self, key=None) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(self.cfg.seed)
        params = init_params(key, self.bundle)
        if self.cfg.init_from != "none":
            from urgent2026_challenge_track1_tpu.utils.convert import load_init_from

            params = load_init_from(self.cfg.init_from, params)
        opt_state = self.optimizer.init(params)
        ema = jax.tree.map(jnp.copy, params) if self.bundle.kind == "flowse" else None
        state = TrainState(params, opt_state, ema, step=0, epoch=0)
        return self._place(state)

    def _place(self, state: TrainState) -> TrainState:
        rep = replicated(self.mesh)
        put = lambda t: jax.device_put(t, rep)
        return TrainState(
            put(state.params),
            put(state.opt_state),
            put(state.ema_params) if state.ema_params is not None else None,
            state.step,
            state.epoch,
            state.batch_in_epoch,
        )

    def maybe_resume(self, state: TrainState) -> TrainState:
        if not self.cfg.resume:
            return state
        latest = self.ckpt.latest_step()
        if latest is None:
            return state
        restored, _ = self.ckpt.restore(latest, state)
        print(f"Resume from checkpoint step {latest}")
        return self._place(restored)

    # -- steps -------------------------------------------------------------

    def _get_train_step(self, fs: int):
        if fs not in self._train_steps:
            self._train_steps[fs] = make_train_step(
                self.bundle, self.optimizer, self.cfg, fs,
                constrain=self._constrain,
            )
        return self._train_steps[fs]

    def _get_train_step_rendered(self, fs: int):
        key = ("rendered", fs)
        if key not in self._train_steps:
            self._train_steps[key] = make_train_step_rendered(
                self.bundle, self.optimizer, self.cfg, fs,
                constrain=self._constrain,
            )
        return self._train_steps[key]

    def _get_val_step(self, fs: int):
        if fs not in self._val_steps:
            self._val_steps[fs] = make_val_step(
                self.bundle, self.cfg, fs, constrain=self._constrain
            )
        return self._val_steps[fs]

    def _set_lr(self, state: TrainState, epoch: int):
        lr = lr_for_epoch(self.cfg, epoch)
        # host scalar: jit converts it at call time, saving one per-epoch
        # host->device transfer (identical semantics to a device array)
        state.opt_state.hyperparams["learning_rate"] = np.float32(lr)
        return lr

    # -- loops -------------------------------------------------------------

    def validate(self, state: TrainState) -> dict:
        params = state.ema_params if state.ema_params is not None else state.params
        totals, count = {}, 0
        # per-fs accumulators: the reference logs {stage}_sisnr_{fs} for val
        # too (d_model.py:82-87) so per-rate regressions stay visible
        fs_totals, fs_counts = {}, {}
        first_flow_sisnr = None
        key = jax.random.PRNGKey(0)
        for clean, noisy, fs, lengths in self.dm.val_dataloader():
            step_fn = self._get_val_step(fs)
            batch = shard_batch(self.mesh, (clean[:, 0], noisy[:, 0], lengths))
            key, sub = jax.random.split(key)
            m = step_fn(params, sub, *batch)
            if self.bundle.kind == "flowse" and fs not in fs_totals:
                # reference flow_model.py:220-230: batch 0 additionally runs
                # the N=10 Euler sampler and logs its SI-SNR.  Extended to
                # the FIRST batch of EACH sampling rate so fs-grouped val
                # sets get a per-fs sampler curve (val_sisnr_{fs}) — the
                # reference's single-fs behavior is the count==0 special
                # case, and val_sisnr keeps its batch-0 meaning below.
                key, sub2 = jax.random.split(key)
                enhanced = flow_mod.flowse_enhance(
                    params, self.bundle.model_cfg, sub2, batch[1], fs, N=10,
                    lengths=batch[2],
                )
                m = dict(m)
                m["sisnr"] = losses.si_snr(batch[0], enhanced, batch[2]).mean()
                if first_flow_sisnr is None:
                    first_flow_sisnr = float(m["sisnr"])
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            if "sisnr" in m:
                fs_totals[fs] = fs_totals.get(fs, 0.0) + float(m["sisnr"])
                fs_counts[fs] = fs_counts.get(fs, 0) + 1
            count += 1
        if count == 0:
            return {"val_loss": float("inf")}
        out = {f"val_{k}": v / count for k, v in totals.items()}
        if "val_sisnr" in out and self.bundle.kind == "flowse":
            out["val_sisnr"] = first_flow_sisnr  # batch-0 value, not a mean
        for fs, tot in fs_totals.items():
            out[f"val_sisnr_{fs}"] = tot / fs_counts[fs]
        return out

    def fit(self, state: Optional[TrainState] = None) -> TrainState:
        cfg = self.cfg
        state = state if state is not None else self.maybe_resume(self.init_state())
        rank, world = jax.process_index(), jax.process_count()
        # per-step keys are derived from the step counter so a mid-epoch
        # resume reproduces the uninterrupted run's randomness exactly
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        profiling = False
        for epoch in range(state.epoch, cfg.num_train_epochs):
            state.epoch = epoch
            lr = self._set_lr(state, epoch)
            self.logger.log(state.step, {"lr": lr, "epoch": epoch})
            loader = self.dm.train_dataloader(
                rank=rank, world_size=world, epoch=epoch,
                skip_batches=state.batch_in_epoch,
            )
            for batch_item in loader:
                if isinstance(batch_item, dict):
                    # on-device dynamic mixing: rendering is FUSED into the
                    # jitted train step (make_train_step_rendered) — one
                    # dispatch per step, no separate render program or
                    # intermediate HBM round-trip
                    fs = batch_item["fs"]
                    render_arrays = tuple(batch_item[k] for k in RENDER_KEYS)
                    clean = noisy = lengths = None
                else:
                    clean, noisy, fs, lengths = batch_item
                    render_arrays = None
                t0 = time.time()
                # jax.profiler trace window (SURVEY.md §5: tracing as a
                # first-class feature; the reference has none)
                if state.step == cfg.profile_start_step and not profiling:
                    jax.profiler.start_trace(os.path.join(self.exp_dir, "profile"))
                    profiling = True
                elif profiling and state.step >= cfg.profile_start_step + cfg.profile_num_steps:
                    jax.profiler.stop_trace()
                    profiling = False
                if render_arrays is not None:
                    step_fn = self._get_train_step_rendered(fs)
                    batch = shard_batch(self.mesh, render_arrays)
                else:
                    step_fn = self._get_train_step(fs)
                    batch = shard_batch(self.mesh, (clean[:, 0], noisy[:, 0], lengths))
                sub = jax.random.fold_in(base_key, state.step)
                state.params, state.opt_state, state.ema_params, metrics = step_fn(
                    state.params, state.opt_state, state.ema_params, sub, *batch
                )
                state.step += 1
                state.batch_in_epoch += 1
                if cfg.runahead_sync_steps and state.step % cfg.runahead_sync_steps == 0:
                    # bound device run-ahead (see Config.runahead_sync_steps)
                    jax.block_until_ready(metrics["loss"])
                if state.step % cfg.log_every_steps == 0:
                    logd = {f"train_{k}": float(v) for k, v in metrics.items()}
                    logd["step_time"] = time.time() - t0
                    if "train_sisnr" in logd:  # discriminative only — the
                        # flow step has no SI-SNR metric (reference parity)
                        logd[f"train_sisnr_{fs}"] = logd["train_sisnr"]
                    self.logger.log(state.step, logd)
                if state.step % cfg.val_check_interval == 0:
                    vm = self.validate(state)
                    self.logger.log(state.step, vm)
                    self.ckpt.save(state.step, state, vm, cfg.to_dict())
            state.epoch = epoch + 1
            state.batch_in_epoch = 0
        if profiling:
            # a profile window overlapping the end of training would
            # otherwise never be stopped and the trace would be lost
            jax.profiler.stop_trace()
        return state
