"""Dynamic request batching for the serving path.

TPU throughput on the text->image pipeline peaks at serving batch sizes
(b=16: 4.9 img/s vs 4.3 at b=4 — BENCHMARKS.md), but HTTP requests arrive
one at a time.  The reference has no serving story at all (its endpoint is a
desktop app); this is the piece a production deployment needs: concurrent
``/generate`` requests are coalesced into one padded TPU batch.

Design points (TPU-first):
  * ONE compiled program: every batch is padded to ``max_batch`` by repeating
    the last request, so XLA never sees a new batch shape (recompiles over
    the serving tunnel cost minutes).  Padding rows are real compute but the
    step cost is dominated by the 256-step scan whose cost at b<=16 is
    nearly flat (launch-bound), so padding is close to free.
  * Requests are grouped by (pose shape, sample_steps) — different static
    shapes cannot share a program.
  * The window opens when the first request is dequeued and closes after
    ``window_ms`` or at ``max_batch``, whichever comes first: an idle server
    adds at most one window of latency, a loaded one runs back-to-back full
    batches.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Sequence


class DynamicBatcher:
    """Coalesce concurrent submissions into batched calls.

    ``run_batch(items) -> list[results]`` is called on a worker thread with
    1..max_batch items; per-item results (or the batch's exception) are
    delivered through the Future each ``submit`` blocks on.
    """

    def __init__(
        self,
        run_batch: Callable[[List[Any]], Sequence[Any]],
        max_batch: int = 8,
        window_ms: float = 30.0,
        group_key: Callable[[Any], Any] = lambda item: None,
        result_timeout_s: float = 600.0,
    ):
        self.run_batch = run_batch
        self.max_batch = max(1, int(max_batch))
        self.window_s = max(0.0, float(window_ms)) / 1000.0
        self.group_key = group_key
        # default deadline for submit(); size it to survive the worst-case
        # run_batch (e.g. a cold-start XLA compile), not the steady state
        self.result_timeout_s = float(result_timeout_s)
        self._queue: "queue.Queue" = queue.Queue()
        # observability (tests + /metrics): recent batch sizes (bounded —
        # a long-lived server must not grow this forever) + running totals.
        # _stats_lock guards iteration vs the worker's appends: CPython
        # deques raise 'mutated during iteration' otherwise
        self.batch_sizes: "collections.deque" = collections.deque(maxlen=4096)
        self._stats_lock = threading.Lock()
        self.total_batches = 0
        self.total_requests = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, item: Any, timeout: float = None) -> Any:
        """Enqueue one request and block until its result is ready (at most
        ``timeout`` seconds, defaulting to the constructor's deadline).

        A timed-out request is cancelled: the worker skips futures that no
        longer have a reader, so overload sheds abandoned work instead of
        burning whole TPU batches on results nobody will read."""
        fut: Future = Future()
        self._queue.put((item, fut))
        try:
            return fut.result(
                timeout=self.result_timeout_s if timeout is None else timeout
            )
        except TimeoutError:
            fut.cancel()  # no-op if the worker already started running it
            raise

    def sizes_snapshot(self) -> List[int]:
        """Thread-safe copy of recent batch sizes (for /metrics)."""
        with self._stats_lock:
            return list(self.batch_sizes)

    # -- worker ---------------------------------------------------------

    def _collect(self) -> List:
        first = self._queue.get()  # block until there is work
        batch = [first]
        deadline = time.monotonic() + self.window_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while True:
            pending = self._collect()
            # group by static-shape key; each group is one TPU program call.
            # group_key runs inside the per-item guard: a raising or
            # unhashable key must fail THAT request, not kill the worker
            # thread (which would leave every future hanging forever)
            groups: Dict[Any, List] = {}
            for item, fut in pending:
                # claim the future: skips requests whose submit() already
                # timed out and cancelled (shed abandoned work)
                if not fut.set_running_or_notify_cancel():
                    continue
                try:
                    groups.setdefault(self.group_key(item), []).append(
                        (item, fut)
                    )
                except Exception as e:
                    fut.set_exception(e)
            for members in groups.values():
                self.total_batches += 1
                self.total_requests += len(members)
                try:
                    results = self.run_batch([it for it, _ in members])
                    if len(results) != len(members):
                        # a silent zip truncation would leave the unmatched
                        # futures hanging until their submit() timeout
                        raise RuntimeError(
                            f"run_batch returned {len(results)} results for "
                            f"{len(members)} items"
                        )
                    with self._stats_lock:
                        self.batch_sizes.append(len(members))
                    for (_, fut), res in zip(members, results):
                        fut.set_result(res)
                except Exception as e:  # fail the batch, keep serving
                    for _, fut in members:
                        if not fut.done():
                            fut.set_exception(e)


def pad_batch(arrays: List, max_batch: int) -> List:
    """Repeat the last element until ``max_batch`` so the stacked batch
    always has the same leading dim (single compiled program)."""
    if not arrays:
        return arrays
    return list(arrays) + [arrays[-1]] * (max_batch - len(arrays))
