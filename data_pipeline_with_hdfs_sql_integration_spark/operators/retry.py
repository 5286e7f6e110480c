"""Driver-level retry (SURVEY.md §2 O14; reference server.py:25-27,
61-68: 5 attempts × 10 s sleep around the extract-load).

Executor-side failures are already retried by Spark
(spark.task.maxFailures); this wrapper is for driver-side source
connection errors (JDBC connect, object-store auth), exactly the
surface the reference retried.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def with_retry(
    fn: Callable[[], T],
    attempts: int = 5,
    sleep_s: float = 10.0,
    retryable: tuple[type[BaseException], ...] = (Exception,),
    on_error: Callable[[int, BaseException], None] | None = None,
) -> T:
    last: BaseException | None = None
    for attempt in range(1, attempts + 1):
        try:
            return fn()
        except retryable as exc:  # noqa: PERF203
            last = exc
            if on_error:
                on_error(attempt, exc)
            if attempt < attempts:
                time.sleep(sleep_s)
    assert last is not None
    raise last
