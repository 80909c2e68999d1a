import json

from demo2_tpu.utils.metrics_log import (
    MetricsLogger,
    TeeWriter,
    load_metrics,
    summarize_run,
    write_markdown_report,
)


def test_jsonl_logging_and_summary(tmp_path):
    p = tmp_path / "m.jsonl"
    log = MetricsLogger(str(p))
    for step, (loss, mAP) in enumerate([(2.0, 0.5), (1.5, 0.7), (1.0, 0.65)]):
        log.add_scalar("Train/Loss", loss, step)
        log.add_scalar("Val/mAP", mAP, step)
        log.add_scalar("Val/Rank-1", mAP + 0.1, step)
    log.close()
    s = summarize_run(str(p))
    assert s["Train/Loss"]["final"] == 1.0
    assert s["Val/mAP"]["best"] == 0.7

    md = write_markdown_report({"run_a": str(p)}, str(tmp_path / "r.md"))
    text = open(md).read()
    assert "run_a" in text and "70.0%" in text


def test_tee_writer(tmp_path):
    p = tmp_path / "m.jsonl"
    tee = TeeWriter(MetricsLogger(str(p)), None)
    tee.add_scalar("x", 1.0, 0)
    tee.close()
    assert len(load_metrics(str(p))) == 1


def test_async_writer_orders_and_forwards(tmp_path):
    """AsyncWriter: scalars and submitted closures execute in order on the
    worker thread; device-array values convert there; close() drains."""
    import jax.numpy as jnp

    from demo2_tpu.utils.metrics_log import AsyncWriter, MetricsLogger

    path = str(tmp_path / "m.jsonl")
    seen = []
    w = AsyncWriter(MetricsLogger(path))
    for i in range(5):
        w.add_scalar("Train/Loss", jnp.float32(i) * 0.5, i)
        w.submit(lambda i=i: seen.append(i))
    w.flush()
    assert seen == [0, 1, 2, 3, 4]
    w.close()

    from demo2_tpu.utils.metrics_log import load_metrics

    rows = load_metrics(path)
    assert [r["value"] for r in rows] == [0.0, 0.5, 1.0, 1.5, 2.0]
    assert [r["step"] for r in rows] == [0, 1, 2, 3, 4]


def test_async_writer_surfaces_worker_exceptions():
    import pytest

    from demo2_tpu.utils.metrics_log import AsyncWriter

    w = AsyncWriter()
    w.submit(lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        w.flush()
    w.close()


def test_async_writer_submit_after_close_raises():
    """Review round 4: enqueueing after close() used to deadlock the next
    flush() (no consumer thread) — must fail fast instead."""
    import pytest

    from demo2_tpu.utils.metrics_log import AsyncWriter

    w = AsyncWriter()
    w.submit(lambda: None)
    w.close()
    with pytest.raises(RuntimeError, match="after close"):
        w.submit(lambda: None)
