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


def test_yaml_config_roundtrip(tmp_path):
    from plr2_tpu.config_io import load_config, save_config, config_from_dict
    from plr2_tpu.config import get_preset

    cfg = config_from_dict({
        "preset": "ycb_refine",
        "dataset": {"num_points": 500, "sym_list": [1, 2]},
        "train": {"lr": 3e-4},
        "eval_refine_iterations": 4,
    })
    assert cfg.dataset.num_points == 500
    assert cfg.dataset.sym_list == (1, 2)
    assert cfg.train.lr == 3e-4
    assert cfg.eval_refine_iterations == 4
    # untouched fields inherit the preset
    assert cfg.model.num_objects == get_preset("ycb_refine").model.num_objects

    p = tmp_path / "cfg.yml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert cfg2 == cfg


def test_yaml_config_rejects_unknown_keys():
    import pytest
    from plr2_tpu.config_io import config_from_dict
    with pytest.raises(KeyError, match="unknown"):
        config_from_dict({"train": {"learning_rate": 1e-4}})
    with pytest.raises(KeyError, match="unknown"):
        config_from_dict({"optimizer": "adam"})


def test_checked_raises_on_nan():
    import pytest
    from plr2_tpu.utils.debug import checked

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked(bad)
    assert float(f(jnp.asarray(1.0))) == 0.0
    with pytest.raises(Exception, match="nan"):
        f(jnp.asarray(-1.0))


def test_cpu_cache_tag_separates_isas(tmp_path):
    """Distinct CPU model/flags must map to distinct cache-dir tags (the
    SIGILL guard for CPU AOT artifacts shared across heterogeneous VMs),
    while volatile cpuinfo fields (cpu MHz) must not churn the tag."""
    from plr2_tpu.utils.cache import cpu_cache_tag

    def info(model, flags, mhz, stepping="7"):
        p = tmp_path / f"{model}_{mhz}_{stepping}.txt"
        p.write_text(f"model name\t: {model}\n"
                     f"stepping\t: {stepping}\n"
                     f"cpu MHz\t\t: {mhz}\n"
                     f"flags\t\t: {flags}\n")
        return str(p)

    avx512 = cpu_cache_tag(info("Xeon-1", "sse2 avx2 avx512f", "2000.0"))
    avx2 = cpu_cache_tag(info("Xeon-1", "sse2 avx2", "2000.0"))
    other = cpu_cache_tag(info("Xeon-2", "sse2 avx2 avx512f", "2000.0"))
    same = cpu_cache_tag(info("Xeon-1", "sse2 avx2 avx512f", "2700.1"))
    # same model name + flags but different stepping: LLVM tunes (e.g.
    # prefer-no-gather) by CPUID triple, so these must NOT alias
    stepped = cpu_cache_tag(info("Xeon-1", "sse2 avx2 avx512f", "2000.0",
                                 stepping="11"))
    assert len({avx512, avx2, other, stepped}) == 4
    assert same == avx512
    # missing file: deterministic platform-based fallback, no crash
    assert cpu_cache_tag(str(tmp_path / "nope")) == cpu_cache_tag(
        str(tmp_path / "nope"))
