"""Config system: CLI flag generation, YAML precedence, train_tag derivation."""

import pytest

from urgent2026_challenge_track1_tpu.config import Config, config_parser


def test_every_default_has_a_flag():
    args = config_parser([])
    cfg = Config()
    for key in vars(cfg):
        if key.startswith("_"):  # private schema bookkeeping, not a flag
            continue
        assert hasattr(args, key), key


def test_bool_coercion():
    args = config_parser(["--resume", "false", "--use_high_pass", "1"])
    assert args.resume is False and args.use_high_pass is True


def test_yaml_overrides_cli_and_sets_train_tag(tmp_path):
    """Reference precedence (config.py:41-52): YAML wins over CLI flags and
    train_tag derives from the YAML basename — passing --num_train_epochs on
    the command line does NOT beat the yaml value."""
    y = tmp_path / "myrun.yaml"
    y.write_text("num_train_epochs: 7\nlearning_rate: 5.0e-4\n")
    args = config_parser(["--num_train_epochs", "99", "--config_file", str(y)])
    cfg = Config(**vars(args)).read_yaml()
    assert cfg.num_train_epochs == 7  # yaml wins
    assert cfg.learning_rate == 5e-4
    assert cfg.train_tag == "myrun"


def test_cli_applies_without_yaml():
    args = config_parser(["--num_train_epochs", "99"])
    cfg = Config(**vars(args)).read_yaml()
    assert cfg.num_train_epochs == 99
    assert cfg.train_tag == "run_0"
