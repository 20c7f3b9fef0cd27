"""Batch iterator — paged retrieval of neighbors per query.

Parity: /root/reference/include/svs/index/vamana/iterator.h:77-134
(BatchIterator: stateful 'next batch_size neighbors', window grows
between batches), iterator_schedule.h:80 (DefaultSchedule: fixed batch)
/ :123 (LinearSchedule: growing batch), ivf/iterator.h.

Spark shape: results for a given (index, parameters) are deterministic,
so paging is ``rank BETWEEN a AND b`` over a search run with k =
cumulative total — re-searching with a grown window between pages
exactly like the reference grows its buffer. The returned page is a
DataFrame; the iterator object holds only driver-side cursor state
(SURVEY §2.11: true incremental state is a serving-layer concern)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class DefaultSchedule:
    """Fixed page size; window grows additively (iterator_schedule.h:80)."""

    batch_size: int
    window_base: int = 32
    window_step: int = 16

    def batch(self, page: int) -> int:
        return self.batch_size

    def window(self, page: int) -> int:
        return self.window_base + page * self.window_step


@dataclass
class LinearSchedule:
    """Linearly growing page size (iterator_schedule.h:123)."""

    batch_size: int
    slope: int = 4
    window_base: int = 32
    window_step: int = 16

    def batch(self, page: int) -> int:
        return self.batch_size + page * self.slope

    def window(self, page: int) -> int:
        return self.window_base + page * self.window_step


@dataclass
class BatchIterator:
    """Pages through neighbors of a fixed query batch.

    ``search_fn(k, window)`` -> (qid, rank, neighbor_id, distance).
    Each ``next_batch()`` re-runs the search with the cumulative k and
    the schedule's (grown) window, then slices the new rank range —
    deterministic parameters make the pages consistent and disjoint."""

    search_fn: Callable[[int, int], DataFrame]
    schedule: DefaultSchedule | LinearSchedule
    _page: int = 0
    _served: int = 0
    _history: list[tuple[int, int]] = field(default_factory=list)

    def next_batch(self) -> DataFrame:
        size = self.schedule.batch(self._page)
        window = self.schedule.window(self._page)
        lo = self._served + 1
        hi = self._served + size
        res = self.search_fn(hi, max(window, hi))
        page = res.filter((F.col("rank") >= lo) & (F.col("rank") <= hi))
        self._history.append((lo, hi))
        self._page += 1
        self._served = hi
        return page

    def update(self) -> None:
        """Restart for a new query batch (iterator.h:174-178)."""
        self._page = 0
        self._served = 0
        self._history.clear()
