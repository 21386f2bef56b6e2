"""Background-thread batch prefetch: the AIO double-buffer reader.

The reference dedicates a pthread to filling the next input buffer
while the main thread aligns the current one (AIOInputBuffer,
aio_thread.h:42-156). Here any batch iterator gets the same treatment:
a daemon thread runs the (gzip/parse/pack) producer and a bounded
queue hands finished batches to the consumer.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(it: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate `it` on a background thread, `depth` items ahead."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def run():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=run, daemon=True, name="soap3dp-aio")
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
