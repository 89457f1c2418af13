"""utils/export_torch.py: JAX->torch checkpoint export.

Pins three contracts against the independent torch oracle
(tests/torch_ref_bsrnn.py):

1. the exported state_dict loads into the reference module graph with
   ``strict=True`` AND in exactly its state-dict key order (the order is
   load-bearing: torch_ema shadow_params are matched to parameters() by
   position — scripts/parity_vs_released.py apply_ema);
2. export is the exact inverse of utils/convert.py (bit-equal round trip);
3. the torch forward of the exported weights matches our jax forward.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.models import bsrnn_flowse as FM
from urgent2026_challenge_track1_tpu.utils import convert, export_torch


def _tree_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_discriminative_export_oracle_parity():
    import torch
    import torch_ref_bsrnn as oracle

    cfg = M.BSRNNConfig(input_dim=481, num_channel=8, num_layer=2, causal=False)
    params = M.init_bsrnn(jax.random.PRNGKey(1), cfg)
    sd = export_torch.export_discriminative_state_dict(params, cfg)

    prefix = "se_model.bsrnn.bsrnn."
    assert all(k.startswith(prefix) for k in sd)
    tmodel = oracle.DiscriminativeBSRNN(input_dim=481, num_channel=8, num_layer=2)
    # key ORDER must match the reference module registration order exactly
    assert [k[len(prefix):] for k in sd] == list(tmodel.state_dict().keys())
    tsd = {k[len(prefix):]: torch.from_numpy(v) for k, v in sd.items()}
    tmodel.load_state_dict(tsd, strict=True)
    tmodel.eval()

    # exact inverse of convert.py
    back = convert.convert_discriminative_state_dict(sd, params, cfg)
    _tree_equal(back, params)

    # forward parity on a random spec
    rng = np.random.default_rng(0)
    spec = (rng.standard_normal((1, 6, 481)) +
            1j * rng.standard_normal((1, 6, 481))).astype(np.complex64) * 0.1
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(spec), 48000).numpy()
    j_out = np.asarray(M.bsrnn_apply(params, jnp.asarray(spec), cfg, 48000))
    rel = np.max(np.abs(j_out - t_out)) / (np.max(np.abs(t_out)) + 1e-12)
    assert rel < 5e-4, rel


def test_flowse_export_oracle_parity_and_ema():
    import torch
    import torch_ref_bsrnn as oracle

    fcfg = FM.FlowSEConfig(bsrnn_hidden=8, num_layer=2)
    cfg = fcfg.dnn_cfg
    params = FM.init_flowse(jax.random.PRNGKey(2), fcfg)
    ema = jax.tree.map(lambda x: 0.5 * x, params)

    ckpt = export_torch.build_lightning_ckpt(
        "flowse", params, cfg, ema_params=ema, step=7, epoch=1)
    sd = ckpt["state_dict"]
    assert ckpt["global_step"] == 7
    # Lightning migration requires the version key; torch_ema load_state_dict
    # indexes collected_params unconditionally
    assert "pytorch-lightning_version" in ckpt
    assert ckpt["ema"]["collected_params"] is None

    tmodel = oracle.FlowBSRNN(
        input_dim=769, num_channel=8, num_layer=2, sub_channel=cfg.sub_channel)
    assert [k[len("dnn."):] for k in sd] == list(tmodel.state_dict().keys())
    tmodel.load_state_dict(
        {k[len("dnn."):]: v for k, v in sd.items()}, strict=True)
    tmodel.eval()

    # round trip back through the importer
    back = convert.convert_flowse_state_dict(sd, params, cfg)
    _tree_equal(back, params)

    # EMA record: shadow_params ordered like state_dict minus t_cond buffers,
    # and applying it (parity_vs_released.apply_ema) yields the EMA weights
    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    from parity_vs_released import apply_ema

    n_tcond = cfg.num_layer
    assert len(ckpt["ema"]["shadow_params"]) == len(sd) - n_tcond
    applied = apply_ema(sd, ckpt["ema"])
    back_ema = convert.convert_flowse_state_dict(applied, params, cfg)
    # every trainable leaf halved; the frozen t_cond projections untouched
    np.testing.assert_array_equal(
        np.asarray(back_ema["condition_fc_w"]),
        0.5 * np.asarray(params["condition_fc_w"]))
    np.testing.assert_array_equal(
        np.asarray(back_ema["layers"]["t_proj_w"]),
        np.asarray(params["layers"]["t_proj_w"]))

    # forward parity through the torch oracle (layouts per
    # tests/test_convert.py::test_flowse_full_forward_matches_torch)
    rng = np.random.default_rng(3)
    F, T = 769, 5
    x = jnp.asarray((rng.standard_normal((1, T, F)) +
                     1j * rng.standard_normal((1, T, F))).astype(np.complex64) * 0.1)
    y = jnp.asarray((rng.standard_normal((1, T, F)) +
                     1j * rng.standard_normal((1, T, F))).astype(np.complex64) * 0.1)
    t_val = jnp.asarray([0.4])

    def tt(z):
        return torch.view_as_complex(
            torch.from_numpy(np.stack([np.asarray(z.real), np.asarray(z.imag)], -1))
        ).permute(0, 2, 1)  # (B, T, F) -> (B, F, T)

    with torch.no_grad():
        g = tmodel(torch.stack([tt(x), tt(y)], dim=1),
                   torch.from_numpy(np.asarray(t_val, np.float32)), 48000)
        ref_out = g[:, 0].permute(0, 2, 1).numpy()
    j_out = -np.asarray(FM.vector_field(params, fcfg, x, t_val, y, 48000))
    rel = np.max(np.abs(j_out - ref_out)) / (np.max(np.abs(ref_out)) + 1e-12)
    assert rel < 5e-4, rel


def test_export_cli_full_circle(tmp_path):
    """orbax trainer checkpoint -> export CLI -> torch .ckpt -> sniffed back
    by our own torch loader: the round trip lands on the EMA weights (the
    reference's flow eval semantics, flow_model.py:98-112)."""
    import json

    import orbax.checkpoint as ocp

    from urgent2026_challenge_track1_tpu.train.trainer import (
        build_model, init_params)
    from urgent2026_challenge_track1_tpu.config import Config
    from urgent2026_challenge_track1_tpu.utils.checkpoint import (
        load_model_for_inference)

    cfg_dict = {"model_type": "flowse", "bsrnn_hidden": 8, "num_layer": 2}
    bundle = build_model(Config(**cfg_dict))
    params = init_params(jax.random.PRNGKey(4), bundle)
    ema = jax.tree.map(lambda x: 0.9 * x, params)
    step_dir = tmp_path / "ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        str(step_dir / "state"),
        {"params": params, "ema": ema, "step": 5, "epoch": 1,
         "batch_in_epoch": 0})
    ckptr.wait_until_finished()
    (step_dir / "meta").mkdir()
    (step_dir / "meta" / "metadata").write_text(
        json.dumps({"val_loss": 0.0, "config": cfg_dict}))

    sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))
    import export_to_torch

    out = tmp_path / "flow_bsrnn.ckpt"
    export_to_torch.main(["--ckpt", str(step_dir), "--out", str(out)])

    kind, params2, mcfg, _ = load_model_for_inference(str(out))
    assert kind == "flowse"
    # flow inference uses the EMA record, not the raw weights
    np.testing.assert_allclose(
        np.asarray(params2["condition_fc_w"]),
        0.9 * np.asarray(params["condition_fc_w"]), rtol=1e-6)
