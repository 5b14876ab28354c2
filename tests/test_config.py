"""Config loader semantics (reference config_loader.py parity)."""

from __future__ import annotations

import json

from sales_data_pipeline_spark.config import (
    deep_merge,
    env_overrides,
    load_config,
    spark_conf_from,
    substitute_vars,
)


def test_deep_merge_nested_and_replace():
    base = {"a": {"x": 1, "y": 2}, "b": [1, 2], "c": "keep"}
    over = {"a": {"y": 3, "z": 4}, "b": [9]}
    out = deep_merge(base, over)
    assert out == {"a": {"x": 1, "y": 3, "z": 4}, "b": [9], "c": "keep"}
    assert base["a"] == {"x": 1, "y": 2}  # no mutation


def test_substitute_vars_default_and_missing():
    env = {"HOME_DIR": "/data"}
    cfg = {
        "path": "${HOME_DIR}/lake",
        "user": "${UNSET_USER:anon}",
        "keep": "${TOTALLY_UNSET}",
        "nested": ["${HOME_DIR}", {"k": "${UNSET_USER:x}"}],
    }
    out = substitute_vars(cfg, env)
    assert out["path"] == "/data/lake"
    assert out["user"] == "anon"
    assert out["keep"] == "${TOTALLY_UNSET}"
    assert out["nested"] == ["/data", {"k": "x"}]


def test_env_overrides_nesting_and_coercion():
    env = {
        "PIPELINE__SPARK__CONF__SPARK_X": "true",
        "PIPELINE__LIMITS__MAX_PCT": "12.5",
        "PIPELINE__MODE": "incremental",
        "OTHER__IGNORED": "1",
    }
    out = env_overrides("PIPELINE", env)
    assert out == {
        "spark": {"conf": {"spark_x": True}},
        "limits": {"max_pct": 12.5},
        "mode": "incremental",
    }


def test_load_config_layering(tmp_path):
    base = tmp_path / "config.json"
    base.write_text(
        json.dumps(
            {
                "pipeline": {"mode": "full_refresh", "buffer": 5},
                "paths": {"lake": "${LAKE_DIR:/tmp/lake}"},
                "spark": {"conf": {"spark.sql.shuffle.partitions": 8}},
            }
        )
    )
    envdir = tmp_path / "environments"
    envdir.mkdir()
    (envdir / "prod.json").write_text(
        json.dumps({"pipeline": {"mode": "incremental"}})
    )
    cfg = load_config(
        str(base),
        env_name="prod",
        env={"PIPELINE__PIPELINE__BUFFER": "10"},
    )
    assert cfg["pipeline"]["mode"] == "incremental"  # overlay
    assert cfg["pipeline"]["buffer"] == 10  # env override
    assert cfg["paths"]["lake"] == "/tmp/lake"  # default substitution
    assert spark_conf_from(cfg) == {"spark.sql.shuffle.partitions": "8"}
