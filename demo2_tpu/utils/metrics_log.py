"""Structured metrics logging + experiment report generation.

Replaces the reference's TensorBoard-or-nothing observability
(train_net.py:93-114) with an always-on JSONL metrics stream per run, plus a
markdown summary generator equivalent to the hand-written reports in the
reference's `experiment_result_summary/`.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional


class MetricsLogger:
    """Append-only JSONL metrics file; TensorBoard-compatible call surface."""

    def __init__(self, path: Optional[str]):
        self.path = path
        self._f = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)

    def add_scalar(self, tag: str, value, step: int):
        if self._f is None:
            return
        self._f.write(
            json.dumps(
                {"t": round(time.time(), 3), "tag": tag, "value": float(value),
                 "step": int(step)}
            )
            + "\n"
        )

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


class AsyncWriter:
    """Run deferred logging work on a background thread.

    On the remote-execution tunnel every device-array -> float conversion
    pays an RTT, and TB/JSONL writes are host I/O; doing either on the
    dispatch thread stalls the step pipeline (docs/PERF.md: the last ~4%
    do_train-vs-bench gap).  `submit(fn)` enqueues a zero-arg callable
    executed IN ORDER on a daemon thread — closures capture completed
    device arrays and convert there.  `add_scalar` forwards to the wrapped
    writer asynchronously, so this can wrap TeeWriter/MetricsLogger/TB.

    Worker exceptions are captured and re-raised on the caller's next
    flush()/close() so logging bugs aren't silently swallowed.
    """

    def __init__(self, inner=None, maxsize: int = 1024):
        import queue
        import threading

        self.inner = inner
        self._q = queue.Queue(maxsize)
        self._exc = None
        self._t = threading.Thread(
            target=self._run, daemon=True, name="demo2-async-writer"
        )
        self._t.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                item()
            except Exception as e:  # noqa: BLE001 — surfaced on flush/close
                self._exc = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def submit(self, fn):
        if getattr(self, "_closed", False):
            # Enqueueing after close() would deadlock the next flush() (no
            # consumer to task_done the item) — fail fast instead.
            raise RuntimeError("AsyncWriter.submit() after close()")
        self._q.put(fn)

    def add_scalar(self, tag, value, step):
        if self.inner is not None:
            self.submit(lambda: self.inner.add_scalar(tag, float(value), int(step)))

    def flush(self):
        self._q.join()
        self._check()

    def close(self):
        self._closed = True
        self._q.put(None)
        self._t.join()
        self._check()
        if self.inner is not None:
            close = getattr(self.inner, "close", None)
            if close:
                close()


class TeeWriter:
    """Fan out add_scalar to several writers (JSONL + TensorBoard)."""

    def __init__(self, *writers):
        self.writers = [w for w in writers if w is not None]

    def add_scalar(self, tag, value, step):
        for w in self.writers:
            w.add_scalar(tag, value, step)

    def close(self):
        for w in self.writers:
            close = getattr(w, "close", None)
            if close:
                close()


def load_metrics(path: str) -> List[Dict[str, Any]]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def summarize_run(path: str) -> Dict[str, Any]:
    """Best/final values per tag from a JSONL metrics file."""
    rows = load_metrics(path)
    out: Dict[str, Any] = {}
    for tag in {r["tag"] for r in rows}:
        vals = [(r["step"], r["value"]) for r in rows if r["tag"] == tag]
        vals.sort()
        out[tag] = {"final": vals[-1][1], "best": max(v for _, v in vals),
                    "steps": len(vals)}
    return out


def write_markdown_report(
    runs: Dict[str, str], out_path: str = "experiment_report.md"
) -> str:
    """Markdown ablation table from {run_name: metrics.jsonl} mappings
    (equivalent of the reference's experiment_result_summary/*.md)."""
    lines = [
        "# Experiment report",
        "",
        "| run | best mAP | best Rank-1 | final loss | eval points |",
        "|---|---|---|---|---|",
    ]
    for name, path in runs.items():
        try:
            s = summarize_run(path)
        except FileNotFoundError:
            lines.append(f"| {name} | (missing) | | | |")
            continue
        mAP = s.get("Val/mAP", {}).get("best", float("nan"))
        r1 = s.get("Val/Rank-1", {}).get("best", float("nan"))
        loss = s.get("Train/Loss", {}).get("final", float("nan"))
        n = s.get("Val/mAP", {}).get("steps", 0)
        lines.append(
            f"| {name} | {mAP * 100:.1f}% | {r1 * 100:.1f}% | {loss:.3f} | {n} |"
        )
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as f:
        f.write(text)
    return out_path
