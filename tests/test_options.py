"""Server option layering: CLI > env > config.toml."""

import pytest

from meilisearch_tpu.option import load_options


def test_defaults(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    opt = load_options([])
    assert opt.http_addr == "localhost:7700"
    assert opt.port == 7700
    assert opt.master_key is None


def test_env_overrides_config(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "config.toml").write_text(
        'http_addr = "0.0.0.0:1111"\nmaster_key = "from-config"\n'
    )
    opt = load_options([])
    assert opt.http_addr == "0.0.0.0:1111"
    assert opt.master_key == "from-config"

    monkeypatch.setenv("MEILI_MASTER_KEY", "from-env")
    opt = load_options([])
    assert opt.master_key == "from-env"

    opt = load_options(["--master-key", "from-cli", "--port", "2222"])
    assert opt.master_key == "from-cli"
    assert opt.port == 2222


def test_production_requires_master_key(monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        load_options(["--env", "production"])
    opt = load_options(["--env", "production", "--master-key", "k"])
    assert opt.env == "production"
