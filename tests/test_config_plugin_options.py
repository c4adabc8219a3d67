"""Plugin-options adapter: a reference user's config block maps 1:1
(translate.rb option names, ECS strings, unknown-option validation)."""

import pytest

from logstash_filter_translate_spark.config import (
    TranslateConfigError,
    from_plugin_options,
)


def test_reference_config_block_maps_directly():
    cfg = from_plugin_options(
        {
            "source": "status",
            "target": "translation",
            "dictionary": {"200": "OK"},
            "exact": True,
            "regex": False,
            "fallback": "no match",
            "override": True,
            "refresh_interval": 60,
            "refresh_behaviour": "replace",
        }
    )
    assert cfg.resolved_source == "status"
    assert cfg.resolved_target == "translation"
    assert cfg.resolved_override


def test_deprecated_aliases_still_work():
    cfg = from_plugin_options({"field": "s", "destination": "d",
                               "dictionary": {}})
    assert cfg.resolved_source == "s" and cfg.resolved_target == "d"


def test_unknown_option_raises():
    with pytest.raises(TranslateConfigError, match="Unknown config option"):
        from_plugin_options({"source": "s", "dictionarry": {}})


@pytest.mark.parametrize("ecs,expected_target", [("disabled", "translation"), ("v1", "s")])
def test_ecs_compatibility_strings(ecs, expected_target):
    cfg = from_plugin_options({"source": "s", "dictionary": {},
                               "ecs_compatibility": ecs})
    assert cfg.resolved_target == expected_target


def test_refresh_scheduler_swaps_dictionary(spark, tmp_path):
    import os
    import time

    from logstash_filter_translate_spark import TranslateConfig
    from logstash_filter_translate_spark.operators.translate import Translate
    from logstash_filter_translate_spark.streaming.scheduler import (
        RefreshScheduler,
    )

    p = tmp_path / "d.csv"
    p.write_text("a,1\n")
    op = Translate(
        TranslateConfig(source="k", dictionary_path=str(p),
                        refresh_behaviour="replace", refresh_interval=1),
        spark=spark,
    )
    refreshed = []
    with RefreshScheduler(op, interval=0.2, on_refresh=refreshed.append):
        p.write_text("a,111\n")
        st = os.stat(p)
        os.utime(p, (st.st_atime, st.st_mtime + 2))
        deadline = time.time() + 10
        while not any(refreshed) and time.time() < deadline:
            time.sleep(0.1)
    assert any(refreshed)
    df = spark.createDataFrame([("a",)], "k string")
    assert op.apply(df).collect()[0]["translation"] == "111"


def test_scheduler_disabled_when_interval_nonpositive(spark):
    from logstash_filter_translate_spark import TranslateConfig
    from logstash_filter_translate_spark.operators.translate import Translate
    from logstash_filter_translate_spark.streaming.scheduler import (
        RefreshScheduler,
    )

    op = Translate(TranslateConfig(source="k", dictionary={"a": "1"}),
                   spark=spark)
    sched = RefreshScheduler(op, interval=0).start()
    assert sched._thread is None
    sched.stop()
