"""A8 config source: YAML file + env override precedence (the reference's
config_test.go contract)."""

import pytest

from ariadna_spark.config import DEFAULTS, load_config, resolve


def test_defaults_alone():
    cfg = load_config(env={})
    assert cfg == DEFAULTS


def test_file_overrides_defaults(tmp_path):
    p = tmp_path / "ariadna.yml"
    p.write_text("n_buckets: 32\nindex_name: code_idx\nextra_key: hello\n")
    cfg = load_config(str(p), env={})
    assert cfg["n_buckets"] == 32 and isinstance(cfg["n_buckets"], int)
    assert cfg["index_name"] == "code_idx"
    assert cfg["extra_key"] == "hello"  # unknown keys pass through
    assert cfg["n_salts"] == DEFAULTS["n_salts"]  # untouched default


def test_env_overrides_file(tmp_path):
    p = tmp_path / "ariadna.yml"
    p.write_text("n_buckets: 32\nout_dir: /from/file\n")
    cfg = load_config(
        str(p), env={"ARIADNA_N_BUCKETS": "64", "ARIADNA_PUBLISH": "false"}
    )
    assert cfg["n_buckets"] == 64  # env beats file
    assert cfg["out_dir"] == "/from/file"  # file beats default
    assert cfg["publish"] is False  # env beats default, bool-coerced


def test_type_coercion_and_bad_yaml(tmp_path):
    cfg = load_config(env={"ARIADNA_BLOCK_SIZE": "256"})
    assert cfg["block_size"] == 256 and isinstance(cfg["block_size"], int)
    bad = tmp_path / "bad.yml"
    bad.write_text("- just\n- a\n- list\n")
    with pytest.raises(ValueError):
        load_config(str(bad), env={})


def test_flag_resolution():
    cfg = load_config(env={"ARIADNA_K": "25"})
    assert resolve(None, cfg, "k") == 25  # no flag -> config
    assert resolve(5, cfg, "k") == 5  # explicit flag wins
