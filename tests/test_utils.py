"""Profiling/logging utility tests."""

import jax.numpy as jnp

from plr2_tpu.utils.profiling import Timer, time_fn
from plr2_tpu.utils.logger import setup_logger


def test_time_fn_reports_stats():
    f = lambda x: x * 2  # noqa: E731
    stats = time_fn(f, jnp.ones((4, 8)), warmup=1, iters=3)
    assert stats["compile_s"] >= 0
    assert stats["mean_ms"] > 0
    assert stats["items_per_s"] > 0


def test_timer_sections():
    t = Timer()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a:" in t.summary()


def test_setup_logger_writes_file(tmp_path):
    log_file = tmp_path / "x" / "train.log"
    logger = setup_logger("t", str(log_file))
    logger.info("hello epoch 1")
    text = log_file.read_text()
    assert "hello epoch 1" in text
