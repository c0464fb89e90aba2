"""Bulk corpus translation: the TPU-native high-throughput path.

The reference streams corpora through the Async worker pool one
request at a time (slimt/Frontend.cc:207-257) — the right design for
a CPU engine fed by interactive traffic. For a TPU engine translating
a known list of lines, the per-request machinery (Request objects,
locks, atomic countdowns, futures) is pure overhead: this module
flattens the whole corpus into segments, packs batches with the same
shortest-first / max_words rule as the Batcher
(slimt/Batcher.cc:95-120), dispatches every batch to the device before
fetching any result (JAX async dispatch pipelines them), and
assembles all Responses in one tight loop.

Response contents are exactly those of Blocking.translate — same
annotations, alignments, cache interaction (probe before translate,
store after; slimt/Request.cc:29-85), HTML extract/restore — verified
by tests/test_bulk.py differential tests. Pivot stays on the general
path.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from slimt_tpu.runtime.request import Hypothesis, cache_key, cache_usable
from slimt_tpu.runtime.response import Options, Response


# Tokenize the next chunk on the completion pool while the main
# thread flattens/dispatches the current one (the Rust batch encoder
# releases the GIL, so the stages overlap). Module flag so A/B
# measurement and emergency rollback don't need a code edit.
THREAD_LOOKAHEAD = True


def _pack(flat, max_words: int):
    """Greedy shortest-first packing under the `(n+1)*maxlen <=
    max_words` budget (slimt/Batcher.cc:95-120); an oversize segment
    becomes a singleton batch rather than stalling."""
    batches: List[list] = []
    current: list = []
    for item in flat:
        length = max(item[0], 1)
        # shortest-first order → `length` is the running max
        if current and (len(current) + 1) * length > max_words:
            batches.append(current)
            current = []
        current.append(item)
    if current:
        batches.append(current)
    return batches


def _ingest_and_dispatch(
    texts, chunk_lines, chunks, processed, hyps, keys,
    model, config, cache, need_alignment, fetch, pool,
    ingest_pool=None,
):
    """Tokenize the corpus chunk by chunk and dispatch each chunk's
    batches before the next chunk tokenizes (appending per-chunk work
    to `chunks` as it goes, so a failure can be drained by the
    caller). With `ingest_pool`, all chunks fan out to worker
    processes immediately and this thread consumes them in order —
    tokenization then scales across cores instead of being capped by
    this process's GIL."""
    model_id = model.id
    pending = []  # (lo, chunk texts, ingest future or None)
    for lo in range(0, len(texts), chunk_lines):
        chunk = texts[lo : lo + chunk_lines]
        future = (
            ingest_pool.submit(model, chunk, config.wrap_length)
            if ingest_pool is not None and len(texts) > chunk_lines
            else None
        )
        pending.append((lo, chunk, future))

    lookahead = (
        THREAD_LOOKAHEAD
        and ingest_pool is None
        and pool is not None
        and len(pending) > 1
    )
    if lookahead:
        # Thread-lookahead: tokenize the NEXT chunk on the completion
        # pool while this thread flattens/packs/dispatches the current
        # one. The Rust batch tokenizer releases the GIL, so the two
        # stages genuinely overlap. Submitted one ahead (not all at
        # once) so ingest tasks never queue behind this chunk's
        # fetches on the shared pool.
        pending = [
            (
                lo,
                chunk,
                pool.submit(
                    model.processor.process_batch, chunk, config.wrap_length
                )
                if i == 1
                else None,
            )
            for i, (lo, chunk, _) in enumerate(pending)
        ]

    for idx, (lo, chunk, future) in enumerate(pending):
        chunk_processed = (
            future.result()
            if future is not None
            else model.processor.process_batch(chunk, config.wrap_length)
        )
        if (
            lookahead
            and idx + 2 < len(pending)
            and pending[idx + 2][2] is None
        ):
            nlo, nchunk, _ = pending[idx + 2]
            pending[idx + 2] = (
                nlo,
                nchunk,
                pool.submit(
                    model.processor.process_batch, nchunk, config.wrap_length
                ),
            )

        # Flatten segments; probe the cache exactly like Request
        # construction does (slimt/Request.cc:29-85).
        flat: List[Tuple[int, int, int, list]] = []  # (len, line, sent, seg)
        for li, (annotated, segments) in enumerate(
            chunk_processed, start=len(processed)
        ):
            slots: List[Optional[Hypothesis]] = [None] * len(segments)
            kslots: List[Optional[int]] = [None] * len(segments)
            for si, seg in enumerate(segments):
                if cache is not None:
                    key = cache_key(model_id, seg)
                    kslots[si] = key
                    found, history = cache.find(key)
                    if found and cache_usable(history, need_alignment):
                        slots[si] = history
                        continue
                flat.append((len(seg), li, si, seg))
            hyps.append(slots)
            keys.append(kslots)
        processed.extend(chunk_processed)

        flat.sort(key=lambda t: (t[0], t[1], t[2]))
        work = []  # pool: futures; serial: (batch, finish) pairs
        for b in _pack(flat, config.max_words):
            finish = model.forward_async(
                [item[3] for item in b], need_alignment=need_alignment
            )
            work.append(
                pool.submit(fetch, b, finish) if pool is not None
                else (b, finish)
            )
        chunks.append((lo, len(processed), work))


def translate_bulk(
    model,
    sources: List[str],
    config,
    cache=None,
    options: Optional[Options] = None,
    meters=None,
    pool=None,
    ingest_pool=None,
) -> List[Response]:
    options = options or Options()
    need_alignment = bool(options.alignment or options.html)

    htmls = None
    texts = list(sources)
    if options.html:
        from slimt_tpu.html.html import HTML

        htmls = []
        for i, source in enumerate(texts):
            html = HTML(source)
            htmls.append(html)
            texts[i] = html.source

    import threading

    from slimt_tpu.utils import Timer

    timer = Timer()
    meter_lock = threading.Lock()  # Timer.elapsed/reset is not atomic
    vocabulary = model.vocabulary

    processed: List[tuple] = []
    hyps: List[List[Optional[Hypothesis]]] = []
    keys: List[List[Optional[int]]] = []

    def fetch(b, finish):
        """Fetch one batch's results and slot them in. Each (li, si)
        slot is written by exactly one batch, so concurrent fetches
        need no locking; finish() releases the GIL during the
        device→host transfer (and decode_batch during the native
        call), so a small pool overlaps the per-batch round-trip
        latency (~27 ms through the measurement tunnel) and the
        ingest of later chunks."""
        histories = finish()
        decoded = vocabulary.decode_batch(
            [history.target for history in histories]
        )
        for (length, li, si, seg), history, dec in zip(b, histories, decoded):
            history.decoded = dec
            hyps[li][si] = history
            if cache is not None:
                cache.store(keys[li][si], history)
        if meters is not None:
            tokens = sum(item[0] for item in b)
            with meter_lock:
                meters.record_batch(
                    words=tokens,
                    elapsed=timer.elapsed(),
                    used=tokens,
                    capacity=len(b) * max(b[-1][0], 1),
                )
                timer.reset()

    # The corpus is ingested in chunks: each chunk's batches are
    # dispatched (and, with a pool, fetched concurrently) before the
    # next chunk tokenizes, so device compute and result round-trips
    # hide behind host ingest instead of following it. Chunking does
    # not change outputs — segments translate independently and
    # padding is inert (differential-tested vs the general path).
    chunk_lines = getattr(config, "bulk_chunk_lines", 2048) or len(texts) or 1
    chunks: List[tuple] = []  # (line_lo, line_hi, per-chunk fetch work)
    try:
        _ingest_and_dispatch(
            texts, chunk_lines, chunks, processed, hyps, keys,
            model, config, cache, need_alignment, fetch, pool,
            ingest_pool=ingest_pool,
        )
    except BaseException:
        # An ingest/dispatch failure (bad input, XLA error) must not
        # leave pool fetches of earlier chunks mutating shared state
        # after the caller sees the exception.
        for _lo, _hi, work in chunks:
            for item in work:
                if pool is not None:
                    try:
                        item.result()
                    except Exception:  # noqa: BLE001
                        pass  # the ingest error is what propagates
        raise

    # Drain and assemble chunk by chunk: while chunk i assembles on
    # this thread, later chunks' fetches keep running on the pool —
    # only the last chunk's assembly is not hidden. On any fetch
    # error, keep draining (no thread may still be mutating state
    # when the error propagates) but skip further assembly.
    responses: List[Response] = []
    first_err = None
    for lo, hi, work in chunks:
        for item in work:
            try:
                if pool is not None:
                    item.result()
                else:
                    fetch(*item)
            except Exception as e:  # noqa: BLE001
                if first_err is None:
                    first_err = e
        if first_err is not None:
            continue
        # Assemble Responses — the Request._complete loop, inlined.
        for li in range(lo, hi):
            annotated, _segments = processed[li]
            slots = hyps[li]
            response = Response()
            response.source = annotated
            target = response.target
            n = len(slots)
            for si, history in enumerate(slots):
                if history.decoded is None:  # cache hit predating decode
                    history.decoded = vocabulary.decode_batch(
                        [history.target]
                    )[0]
                data, ends = history.decoded
                target.append_sentence_raw(annotated.gap_data(si), data, ends)
                if si + 1 == n:
                    target.append_ending_whitespace_data(annotated.gap_data(n))
                response.alignments.append(history.alignment)
            if htmls is not None:
                htmls[li].restore(response)
            responses.append(response)
    if first_err is not None:
        raise first_err
    return responses
