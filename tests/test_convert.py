"""Torch-checkpoint conversion: build a torch state dict with the reference's
key layout and verify the converted pytree reproduces torch-computed pieces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from urgent2026_challenge_track1_tpu.models import bsrnn as M
from urgent2026_challenge_track1_tpu.utils import convert


def _make_disc_state_dict(cfg, prefix="se_model.bsrnn.bsrnn."):
    """Synthesize a state dict with espnet BSRNN key names/shapes."""
    torch.manual_seed(0)
    sd = {}
    C = cfg.num_channel
    hdim = 2 * C
    t_out = hdim * 2 if not cfg.causal else hdim
    for i, sub in enumerate(cfg.subbands):
        cw = 2 * sub
        sd[f"{prefix}band_split.norm.{i}.weight"] = torch.randn(cw)
        sd[f"{prefix}band_split.norm.{i}.bias"] = torch.randn(cw)
        sd[f"{prefix}band_split.fc.{i}.weight"] = torch.randn(C, cw, 1)
        sd[f"{prefix}band_split.fc.{i}.bias"] = torch.randn(C)
    for i in range(cfg.num_layer):
        sd[f"{prefix}norm_time.{i}.weight"] = torch.randn(C)
        sd[f"{prefix}norm_time.{i}.bias"] = torch.randn(C)
        for name, bidir in (("rnn_time", not cfg.causal), ("rnn_freq", True)):
            for sfx in ([""] if not bidir else ["", "_reverse"]):
                sd[f"{prefix}{name}.{i}.weight_ih_l0{sfx}"] = torch.randn(4 * hdim, C)
                sd[f"{prefix}{name}.{i}.weight_hh_l0{sfx}"] = torch.randn(4 * hdim, hdim)
                sd[f"{prefix}{name}.{i}.bias_ih_l0{sfx}"] = torch.randn(4 * hdim)
                sd[f"{prefix}{name}.{i}.bias_hh_l0{sfx}"] = torch.randn(4 * hdim)
        sd[f"{prefix}fc_time.{i}.weight"] = torch.randn(C, t_out)
        sd[f"{prefix}fc_time.{i}.bias"] = torch.randn(C)
        sd[f"{prefix}norm_freq.{i}.weight"] = torch.randn(C)
        sd[f"{prefix}norm_freq.{i}.bias"] = torch.randn(C)
        sd[f"{prefix}fc_freq.{i}.weight"] = torch.randn(C, 4 * C)
        sd[f"{prefix}fc_freq.{i}.bias"] = torch.randn(C)
    for head in ("mlp_mask", "mlp_residual"):
        for i, sub in enumerate(cfg.subbands):
            sd[f"{prefix}mask_decoder.{head}.{i}.0.weight"] = torch.randn(C)
            sd[f"{prefix}mask_decoder.{head}.{i}.0.bias"] = torch.randn(C)
            sd[f"{prefix}mask_decoder.{head}.{i}.1.weight"] = torch.randn(4 * C, C, 1)
            sd[f"{prefix}mask_decoder.{head}.{i}.1.bias"] = torch.randn(4 * C)
            sd[f"{prefix}mask_decoder.{head}.{i}.3.weight"] = torch.randn(4 * sub, 4 * C, 1)
            sd[f"{prefix}mask_decoder.{head}.{i}.3.bias"] = torch.randn(4 * sub)
    return sd


def test_discriminative_conversion_shapes_and_values():
    cfg = M.BSRNNConfig(input_dim=481, num_channel=8, num_layer=2)
    template = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    sd = _make_disc_state_dict(cfg)
    params = convert.convert_discriminative_state_dict(sd, template, cfg)

    # structure matches init exactly
    t_paths = {"/".join(map(str, p)) for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]}
    c_paths = {"/".join(map(str, p)) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert t_paths == c_paths
    def by_path(tree):
        return {
            "/".join(map(str, p)): v
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    tmap, cmap = by_path(template), by_path(params)
    for k in tmap:
        assert tmap[k].shape == cmap[k].shape, (k, tmap[k].shape, cmap[k].shape)

    # spot values: band 3 conv weight row-for-row
    sub = cfg.subbands[3]
    ref_w = sd["se_model.bsrnn.bsrnn.band_split.fc.3.weight"][:, :, 0].numpy()
    np.testing.assert_allclose(
        np.asarray(params["band_split"]["w"][3][: 2 * sub]), ref_w.T
    )
    # LSTM tensors pass through unchanged (gate order identical)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["rnn_time"]["w_ih"][1]),
        sd["se_model.bsrnn.bsrnn.rnn_time.1.weight_ih_l0"].numpy(),
    )
    # GLU pre-split: value = first half, gate = second half of conv2 rows
    w2 = sd["se_model.bsrnn.bsrnn.mask_decoder.mlp_mask.0.3.weight"][:, :, 0].numpy()
    sub0 = cfg.subbands[0]
    np.testing.assert_allclose(
        np.asarray(params["mask_decoder"]["mask"]["wv"][0][:, : 2 * sub0]),
        w2[: 2 * sub0].T,
    )
    np.testing.assert_allclose(
        np.asarray(params["mask_decoder"]["mask"]["wg"][0][:, : 2 * sub0]),
        w2[2 * sub0 :].T,
    )

    # converted params run through the model
    spec = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 81)) + 0j
    out = M.bsrnn_apply(params, spec.astype(jnp.complex64), cfg, 8000)
    assert np.all(np.isfinite(np.asarray(out.real)))


def test_load_init_from_torch_file(tmp_path):
    cfg = M.BSRNNConfig(input_dim=481, num_channel=8, num_layer=2)
    template = M.init_bsrnn(jax.random.PRNGKey(0), cfg)
    sd = _make_disc_state_dict(cfg)
    path = tmp_path / "model.ckpt"
    torch.save({"state_dict": sd}, path)
    params = convert.load_init_from(str(path), template)
    assert np.asarray(params["band_split"]["b"]).shape == template["band_split"]["b"].shape
