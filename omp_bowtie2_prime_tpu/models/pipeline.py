"""Async host pipeline: input read-ahead + ordered output writer.

The analog of the reference's dedicated parser thread + lock-free ready
queue (PatternSourceReadAheadFactory, pat.h:1283-1402, readAsync :1380)
and its input-order OutputQueue writer (outq.h:31-160). Three stages
overlap: a producer thread parses FASTQ batches ahead, the main thread
drives device alignment, and a writer thread formats/emits SAM in strict
input order. Device waits release the GIL, so parsing and emission hide
behind them.
"""

from __future__ import annotations

import queue
import threading

_DONE = object()


def run_pipeline(batches, align_fn, emit_fn, depth: int = 2):
    """batches: iterator of input batches; align_fn(batch) -> results;
    emit_fn(batch, results) -> None (called in input order)."""
    in_q: queue.Queue = queue.Queue(maxsize=depth)
    out_q: queue.Queue = queue.Queue(maxsize=depth)
    errs: list = []

    def producer():
        try:
            for b in batches:
                in_q.put(b)
        except BaseException as e:  # surface parse errors in the main thread
            errs.append(e)
        finally:
            in_q.put(_DONE)

    def writer():
        while True:
            item = out_q.get()
            if item is _DONE:
                return
            try:
                emit_fn(*item)
            except BaseException as e:
                errs.append(e)
                return

    pt = threading.Thread(target=producer, daemon=True)
    wt = threading.Thread(target=writer, daemon=True)
    pt.start()
    wt.start()
    n = 0
    try:
        while True:
            if errs:
                raise errs[0]
            b = in_q.get()
            if b is _DONE:
                break
            results = align_fn(b)
            out_q.put((b, results))
            n += len(b)
    finally:
        out_q.put(_DONE)
        wt.join()
        if errs:
            raise errs[0]
    return n
