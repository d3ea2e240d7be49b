"""Distributed top-k BM25 over compressed segments with block-max pruning
(SURVEY.md E5/E6, M6).

Query lifecycle (the native replacement for ariadna's delegated ES match
query, /root/reference/osm/osm.go:181, /root/reference/elastic contract):

 1. analyze the query with the SAME analyzer as the index (symmetric
    analyzer discipline),
 2. prune segment *buckets* driver-side (crc32(term) % n_buckets — only
    directories that can contain a query term are listed at all),
 3. scan those buckets with a pushed-down `term IN (...)` filter
    (parquet row-group pruning on the sorted term column),
 4. partition the matched blocks by doc_id range (each block is assigned
    to every range it overlaps; decoded ids are masked to the range so a
    doc is scored exactly once),
 5. inside each range partition, an Arrow kernel runs *stride-level
    block-max WAND*: strides are scored in descending upper-bound order
    (UB = sum over terms of the max block_max_score overlapping the
    stride) and the kernel stops as soon as UB <= current local top-k
    threshold theta — blocks in never-visited strides are never decoded,
 6. per-range top-k rows are merged globally by
    orderBy(score desc, doc_id asc).limit(k) — a TakeOrdered merge of
    tiny per-partition heaps, not a full sort.

Scale notes: nothing per-doc ever reaches the driver; the only data
movement is (matched blocks -> range shuffle) and (k rows per range ->
driver). Threshold sharing across ranges is intentionally not done (it
would serialize partitions); each range prunes locally, which is the
standard distributed BMW trade-off.
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import B, K1
from .._pickle import register_by_value
from ..analyze import tokenize_py
from ..functions.varint import delta_decode_ids, positions_decode, varint_decode

RANGE_SIZE_DEFAULT = 8192  # doc_ids per WAND partition at test scale
STRIDE = 1024  # doc_ids per pruning stride inside a range

WAND_OUT_SCHEMA = "doc_id long, score double"


def _idf_map(tdf, n_docs: int) -> dict[str, float]:
    """BM25 idf per term off the (term, df) block rows. df is clamped to
    the live doc count N: per-term df stays overcounted for tombstoned
    docs until compaction (the documented Lucene deleted-docs drift), and
    after a large delete_by_query df can exceed N — which would flip idf
    negative and zero every block-max upper bound, pruning ALL results.
    min(df, N) keeps idf positive and is bit-identical to the unclamped
    form whenever there is no drift (df <= N)."""
    return {
        t: float(np.log(1.0 + (n_docs - min(int(d), n_docs) + 0.5) / (min(int(d), n_docs) + 0.5)))
        for t, d in zip(tdf["term"], tdf["df"])
    }


def _score_block(tf: np.ndarray, dl: np.ndarray, idf: float, avgdl: float) -> np.ndarray:
    return idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _bmw_range_topk(
    sub: np.ndarray,
    row_term: np.ndarray,
    fd: np.ndarray,
    ld: np.ndarray,
    bms: np.ndarray,
    decode,
    k: int,
    lo: int,
    range_size: int,
    stride: int,
    after: tuple[float, int] | None = None,
    stride_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Stride-level block-max WAND over ONE doc_id range, restricted to the
    posting-block rows indexed by `sub` (the shared core of wand_kernel and
    multiquery_kernel — the batch path reuses it per query over a SHARED
    decode cache, so a stop-word block is decoded once for the whole batch
    while every query still gets its own block-max pruning, ADVICE r3).

    `decode(i)` returns the (ids, scores) of global row i, masked to this
    range and tombstone-filtered; callers memoize it. Strides are visited
    in descending metadata upper-bound order and the loop stops as soon as
    UB < the current k-th score (strict <, preserving doc_id tie-break
    rank-identity). Returns (doc_ids, scores) sorted by (-score, doc_id),
    at most k entries.

    `after=(score, doc_id)` is the search_after cursor (ES deep-pagination
    semantics): only docs strictly AFTER the cursor in (score desc, doc_id
    asc) order qualify — score < cursor score, or equal score with a
    larger doc_id. The cut happens after exact per-stride scoring (a
    stride's bound says nothing about which side of the cursor its docs
    land on), so block-max pruning still only compares against the
    qualifying top-k threshold and stays sound.

    `stride_mask` (bool, n_strides) zeroes the upper bound of strides a
    caller has proven empty of eligible docs (e.g. no filter-allowed doc
    falls inside) — they are never visited, so their blocks never decode.
    """
    n_strides = (range_size + stride - 1) // stride
    sub_fd, sub_ld = fd[sub], ld[sub]
    sub_term = row_term[sub]
    s_lo = np.maximum((sub_fd - lo) // stride, 0)
    s_hi = np.minimum((sub_ld - lo) // stride, n_strides - 1)
    ub = np.zeros(n_strides, dtype=np.float64)
    # terms in order of first appearance (bit-identical ub accumulation to
    # the historical single-query loop, which iterated pandas .unique())
    uniq_t, first_idx = np.unique(sub_term, return_index=True)
    for t in uniq_t[np.argsort(first_idx)]:
        term_ub = np.zeros(n_strides, dtype=np.float64)
        for j in np.flatnonzero(sub_term == t):
            a, b_ = int(s_lo[j]), int(s_hi[j])
            if b_ < 0 or a >= n_strides:
                continue
            seg = term_ub[a : b_ + 1]
            np.maximum(seg, bms[sub[j]], out=seg)
        ub += term_ub

    if stride_mask is not None:
        ub[~stride_mask] = 0.0
    order = np.argsort(-ub, kind="stable")
    heap: list[tuple[float, int]] = []  # min-heap of (score, -doc_id)
    theta = 0.0
    for si in order:
        if ub[si] <= 0.0:
            break
        # Strict <: a stride with ub == theta could still hold a doc tying
        # the k-th score but winning the doc_id tie-break (rank-identity).
        if len(heap) >= k and ub[si] < theta:
            break  # block-max pruning: no doc in this stride can enter top-k
        st_lo, st_hi = lo + si * stride, lo + (si + 1) * stride
        cand_ids: list[np.ndarray] = []
        cand_sc: list[np.ndarray] = []
        overlap = np.flatnonzero((sub_fd < st_hi) & (sub_ld >= st_lo))
        for j in overlap:
            ids, sc = decode(int(sub[j]))
            m = (ids >= st_lo) & (ids < st_hi)
            if m.any():
                cand_ids.append(ids[m])
                cand_sc.append(sc[m])
        if not cand_ids:
            continue
        all_ids = np.concatenate(cand_ids)
        all_sc = np.concatenate(cand_sc)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        sums = np.zeros(uniq.shape, dtype=np.float64)
        np.add.at(sums, inv, all_sc)
        if after is not None:
            a_s, a_d = after
            keep = (sums < a_s) | ((sums == a_s) & (uniq > a_d))
            uniq, sums = uniq[keep], sums[keep]
            if uniq.size == 0:
                continue
        heap, theta = _merge_stride_topk(heap, uniq, sums, k)

    pairs = sorted(((-d, s) for s, d in heap), key=lambda x: (-x[1], x[0]))
    if not pairs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    d_out, s_out = zip(*pairs)
    return np.asarray(d_out, dtype=np.int64), np.asarray(s_out, dtype=np.float64)


_EMPTY_TOPK = {"doc_id": "int64", "score": "float64"}


def _split_pseudo_rows(pdf: pd.DataFrame) -> tuple[pd.DataFrame, np.ndarray | None, dict]:
    """Strip the two pseudo-row families that ride the rid shuffle and
    return (block_rows, allow, dead). `allow` (sorted int64 ids, or None
    when no filter context) comes from is_filt rows — the ES bool-filter
    allow-list; `dead` maps build id -> dead doc_ids from is_tomb rows —
    the per-segment overwrite tombstones. Shared by every kernel that
    consumes the ranged union (wand_kernel, bool_kernel)."""
    allow: np.ndarray | None = None
    if "is_filt" in pdf.columns:
        fm = pdf["is_filt"].to_numpy().astype(bool)
        allow = np.sort(pdf.loc[fm, "first_doc_id"].to_numpy().astype(np.int64))
        pdf = pdf[~fm].reset_index(drop=True)
    dead: dict = {}
    if not pdf.empty and "is_tomb" in pdf.columns:
        tm = pdf["is_tomb"].to_numpy()
        if tm.any():
            trows = pdf[tm]
            dead = {
                b: g["first_doc_id"].to_numpy().astype(np.int64)
                for b, g in trows.groupby("bid")
            }
            pdf = pdf[~tm].reset_index(drop=True)
    return pdf, allow, dead


def _make_decoder(pdf, idf_by_term, row_term, lo, hi, dead, row_bid, allow, avgdl):
    """Lazy per-block decode closure: ids masked to [lo, hi), dead
    versions and filter-context exclusions applied, scores precomputed.
    Memoized — a block decodes at most once per kernel invocation; the
    memo dict doubles as the decode counter for prune_stats."""
    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def decode(i: int) -> tuple[np.ndarray, np.ndarray]:
        if i not in decoded:
            ids = delta_decode_ids(pdf["doc_ids_varint"].iloc[i])
            tfs = varint_decode(pdf["tfs_varint"].iloc[i]).astype(np.float64)
            dls = varint_decode(pdf["dls_varint"].iloc[i]).astype(np.float64)
            sc = _score_block(tfs, dls, idf_by_term[row_term[i]], avgdl)
            m = (ids >= lo) & (ids < hi)
            if dead and row_bid is not None:
                dd = dead.get(row_bid[i])
                if dd is not None and dd.size:
                    m &= ~np.isin(ids, dd)  # overwritten versions never score
            if allow is not None:
                m &= np.isin(ids, allow)  # filter context: allowed docs only
            decoded[i] = (ids[m], sc[m])
        return decoded[i]

    return decode, decoded


def _merge_stride_topk(heap, uniq, sums, k):
    """Merge one stride's qualifying (uniq ids, summed scores) into the
    running top-k heap. Strides partition the doc_id space, so the heap
    and this stride's candidates are disjoint — one lexsort (doc_id asc
    breaks score ties) replaces a per-doc loop. Returns (heap, theta)."""
    if heap:
        hs = np.fromiter((s for s, _ in heap), dtype=np.float64, count=len(heap))
        hd = np.fromiter((-d for _, d in heap), dtype=np.int64, count=len(heap))
        all_s = np.concatenate([hs, sums])
        all_d = np.concatenate([hd, uniq])
    else:
        all_s, all_d = sums, uniq
    if all_d.size > k:
        top = np.lexsort((all_d, -all_s))[:k]
        all_s, all_d = all_s[top], all_d[top]
    heap = [(s, -d) for s, d in zip(all_s.tolist(), all_d.tolist())]
    heapq.heapify(heap)
    return heap, (heap[0][0] if len(heap) >= k else 0.0)


def wand_kernel(
    pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    range_size: int,
    stride: int = STRIDE,
    prune_stats: dict | None = None,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """Blocks of all query terms for ONE doc_id range -> local top-k.

    Vectorized: per-stride upper bounds come from block metadata only;
    blocks are decoded lazily, at most once, and only when their stride is
    actually visited. Each block row carries the GLOBAL df of its term (a
    broadcast join against the merged terms tables), so idf is derived
    here — no driver-side stats round-trip per query.
    """
    rid = int(pdf["rid"].iloc[0])
    empty = pd.DataFrame({"doc_id": [], "score": []}).astype(_EMPTY_TOPK)
    # Pseudo-rows ride the same rid shuffle as the blocks (never a
    # driver-held set): is_filt rows carry the ES filter-context
    # allow-list, is_tomb rows the per-segment overwrite tombstones.
    pdf, allow, dead = _split_pseudo_rows(pdf)
    if (allow is not None and allow.size == 0) or pdf.empty:
        return empty
    row_bid = pdf["bid"].to_numpy() if "bid" in pdf.columns else None
    tdf = pdf[["term", "df"]].drop_duplicates("term")
    idf_by_term = _idf_map(tdf, n_docs)
    lo, hi = rid * range_size, (rid + 1) * range_size
    fd = pdf["first_doc_id"].to_numpy()
    ld = pdf["last_doc_id"].to_numpy()
    # block max score = idf(term) * stored idf-free tfnorm max, scaled by
    # the per-segment bound correction (1.0 for a single-build index; for
    # merge-on-read, max(1, avgdl_global/avgdl_segment) keeps the stored
    # per-build tfnorm max a valid upper bound under the global avgdl)
    scale = pdf["scale"].to_numpy() if "scale" in pdf.columns else 1.0
    bms = pdf["block_max_tfnorm"].to_numpy() * pdf["term"].map(idf_by_term).to_numpy() * scale
    row_term = pdf["term"].to_numpy()
    decode, decoded = _make_decoder(
        pdf, idf_by_term, row_term, lo, hi, dead, row_bid, allow, avgdl
    )

    stride_mask = None
    if allow is not None:
        # strides holding no allowed doc can never produce a candidate:
        # zero their bound so they are never visited (blocks never decode)
        n_strides = (range_size + stride - 1) // stride
        stride_mask = np.zeros(n_strides, dtype=bool)
        stride_mask[np.unique((allow - lo) // stride)] = True
    d_out, s_out = _bmw_range_topk(
        np.arange(len(pdf)),
        row_term,
        fd,
        ld,
        bms,
        decode,
        k,
        lo,
        range_size,
        stride,
        after=after,
        stride_mask=stride_mask,
    )
    if prune_stats is not None:
        prune_stats["n_blocks_total"] = len(pdf)
        prune_stats["n_blocks_decoded"] = len(decoded)
    return pd.DataFrame({"doc_id": d_out, "score": s_out}).astype(
        {"doc_id": "int64", "score": "float64"}
    )


def bool_kernel(
    pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    k: int,
    range_size: int,
    must_terms: list[str],
    should_terms: list[str],
    not_terms: list[str],
    msm: int = 0,
    stride: int = STRIDE,
    prune_stats: dict | None = None,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """ES bool-query kernel for ONE doc_id range: top-k over docs that
    contain EVERY must term, at least `msm` distinct should terms, and NO
    must_not term; score = BM25 sum over must+should occurrences (the ES
    bool semantics — filter context rides the existing is_filt rows).

    Pruning stays block-max sound and gains a conjunctive rule: a stride
    not covered by ≥1 block of EVERY must term cannot hold a qualifying
    doc (a doc's posting for each must term lives in a block spanning its
    id), so its bound is zeroed and its blocks never decode — the
    dominant win for selective conjunctions. must_not blocks never
    contribute to bounds; they decode only in strides actually visited.

    Clause term sets must be disjoint (asserted in bool_topk)."""
    empty = pd.DataFrame({"doc_id": [], "score": []}).astype(_EMPTY_TOPK)
    rid = int(pdf["rid"].iloc[0])
    pdf, allow, dead = _split_pseudo_rows(pdf)
    if (allow is not None and allow.size == 0) or pdf.empty:
        return empty
    must_s, should_s, not_s = set(must_terms), set(should_terms), set(not_terms)
    present = set(pdf["term"])
    # a must term with no block in this range -> nothing here qualifies
    # (and if the term is absent from the whole index, EVERY range hits
    # this branch — the globally correct empty result)
    if must_s - present:
        return empty

    row_bid = pdf["bid"].to_numpy() if "bid" in pdf.columns else None
    tdf = pdf[["term", "df"]].drop_duplicates("term")
    idf_by_term = _idf_map(tdf, n_docs)
    lo, hi = rid * range_size, (rid + 1) * range_size
    fd = pdf["first_doc_id"].to_numpy()
    ld = pdf["last_doc_id"].to_numpy()
    scale = pdf["scale"].to_numpy() if "scale" in pdf.columns else np.ones(len(pdf))
    row_term = pdf["term"].to_numpy()
    is_not = np.asarray([t in not_s for t in row_term])
    is_must = np.asarray([t in must_s for t in row_term])
    bms = (
        pdf["block_max_tfnorm"].to_numpy()
        * pdf["term"].map(idf_by_term).to_numpy()
        * scale
    )

    decode, decoded = _make_decoder(
        pdf, idf_by_term, row_term, lo, hi, dead, row_bid, allow, avgdl
    )

    n_strides = (range_size + stride - 1) // stride
    s_lo = np.maximum((fd - lo) // stride, 0).astype(np.int64)
    s_hi = np.minimum((ld - lo) // stride, n_strides - 1).astype(np.int64)
    # upper bound: scoring (must+should) terms only, max-per-term summed
    ub = np.zeros(n_strides, dtype=np.float64)
    for t in dict.fromkeys(row_term[~is_not]):
        term_ub = np.zeros(n_strides, dtype=np.float64)
        for j in np.flatnonzero((row_term == t) & ~is_not):
            a, b_ = int(s_lo[j]), int(s_hi[j])
            if b_ < 0 or a >= n_strides:
                continue
            seg = term_ub[a : b_ + 1]
            np.maximum(seg, bms[j], out=seg)
        ub += term_ub
    # conjunctive coverage: zero strides missing any must term's blocks
    for t in must_s:
        cov = np.zeros(n_strides, dtype=bool)
        for j in np.flatnonzero(row_term == t):
            a, b_ = int(s_lo[j]), int(s_hi[j])
            if b_ < 0 or a >= n_strides:
                continue
            cov[a : b_ + 1] = True
        ub[~cov] = 0.0
    if allow is not None:
        amask = np.zeros(n_strides, dtype=bool)
        amask[np.unique((allow - lo) // stride)] = True
        ub[~amask] = 0.0

    n_must = len(must_s)
    order = np.argsort(-ub, kind="stable")
    heap: list[tuple[float, int]] = []
    theta = 0.0
    for si in order:
        if ub[si] <= 0.0:
            break
        if len(heap) >= k and ub[si] < theta:
            break
        st_lo, st_hi = lo + si * stride, lo + (si + 1) * stride
        overlap = np.flatnonzero((fd < st_hi) & (ld >= st_lo))
        sc_ids, sc_sc, sc_must, sc_should = [], [], [], []
        ex_ids = []
        for j in overlap:
            ids, sc = decode(int(j))
            m = (ids >= st_lo) & (ids < st_hi)
            if not m.any():
                continue
            if is_not[j]:
                ex_ids.append(ids[m])
            else:
                sc_ids.append(ids[m])
                sc_sc.append(sc[m])
                sc_must.append(np.full(int(m.sum()), is_must[j]))
                sc_should.append(np.full(int(m.sum()), not is_must[j]))
        if not sc_ids:
            continue
        all_ids = np.concatenate(sc_ids)
        all_sc = np.concatenate(sc_sc)
        all_must = np.concatenate(sc_must).astype(np.int64)
        all_should = np.concatenate(sc_should).astype(np.int64)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        sums = np.zeros(uniq.shape, dtype=np.float64)
        np.add.at(sums, inv, all_sc)
        mcnt = np.zeros(uniq.shape, dtype=np.int64)
        np.add.at(mcnt, inv, all_must)  # one posting per (term, doc)
        scnt = np.zeros(uniq.shape, dtype=np.int64)
        np.add.at(scnt, inv, all_should)
        keep = (mcnt == n_must) & (scnt >= msm)
        if ex_ids:
            keep &= ~np.isin(uniq, np.concatenate(ex_ids))
        uniq, sums = uniq[keep], sums[keep]
        if uniq.size == 0:
            continue
        if after is not None:
            # search_after cut on exact scores (same sound placement as
            # _bmw_range_topk: a stride bound says nothing about which
            # side of the cursor its docs land on)
            a_s, a_d = after
            keep_a = (sums < a_s) | ((sums == a_s) & (uniq > a_d))
            uniq, sums = uniq[keep_a], sums[keep_a]
            if uniq.size == 0:
                continue
        heap, theta = _merge_stride_topk(heap, uniq, sums, k)

    if prune_stats is not None:
        prune_stats["n_blocks_total"] = len(pdf)
        prune_stats["n_blocks_decoded"] = len(decoded)
    pairs = sorted(((-d, s) for s, d in heap), key=lambda x: (-x[1], x[0]))
    if not pairs:
        return empty
    d_out, s_out = zip(*pairs)
    return pd.DataFrame(
        {"doc_id": np.asarray(d_out, dtype=np.int64), "score": np.asarray(s_out)}
    ).astype({"doc_id": "int64", "score": "float64"})


def _two_pass_positions(
    pdf: pd.DataFrame,
    uniq_terms: list[str],
    row_term: np.ndarray,
    lo: int,
    hi: int,
    dead: dict,
    row_bid,
    or_terms: list[str] | None = None,
    allow: np.ndarray | None = None,
) -> tuple[dict | None, np.ndarray | None]:
    """Shared two-pass decode for the positional kernels (VERDICT r3 #5).

    PASS 1 decodes ONLY doc_ids (+tf lengths) per block and intersects the
    terms' posting lists into the candidate doc set — the positions stream
    is never touched. PASS 2 decodes positions exclusively for blocks that
    actually contain a candidate, and restricts the occurrence arrays to
    candidate docs before the per-occurrence np.repeat materializes.

    Bounds the stop-word-phrase cost: a stop-word term's (large) positions
    stream is decoded only where the rare terms left a survivor, so a
    phrase like "the merge" pays positions ~proportional to df("merge"),
    not df("the").

    `or_terms` (phrase-prefix support): an additional DISJUNCTIVE term
    group — candidates must also contain AT LEAST ONE of them (the union
    of their posting lists intersects the required set). or_terms absent
    from this range are simply skipped; per_term carries the surviving
    ones alongside the required terms.

    Returns (per_term, cand_docs) with per_term[t] = (ids, tfs, dls,
    occ_doc, occ_pos) restricted to candidates, or (None, None) when any
    required term is absent, no or_term is present, or the intersection
    is empty."""
    term_rows: dict[str, np.ndarray] = {}
    raw: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    cand_docs = None

    def decode_ids(t: str, rows: np.ndarray) -> np.ndarray:
        parts = []
        for i in rows:
            ids = delta_decode_ids(pdf["doc_ids_varint"].iloc[i])
            tfs = varint_decode(pdf["tfs_varint"].iloc[i]).astype(np.int64)
            msk = (ids >= lo) & (ids < hi)
            if dead and row_bid is not None:
                dd = dead.get(row_bid[i])
                if dd is not None and dd.size:
                    msk &= ~np.isin(ids, dd)
            raw[i] = (ids, tfs, msk)
            parts.append(ids[msk])
        return np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)

    for t in uniq_terms:
        rows = np.flatnonzero(row_term == t)
        if not rows.size:
            return None, None  # a required term absent in this range -> no match
        term_rows[t] = rows
        u = decode_ids(t, rows)
        cand_docs = u if cand_docs is None else np.intersect1d(
            cand_docs, u, assume_unique=True
        )
        if cand_docs.size == 0:
            return None, None
    if allow is not None and cand_docs is not None:
        # ES filter context: only docs passing the docmap predicate can
        # match — narrowing HERE means PASS 2 never decodes positions for
        # filtered-out docs (filter-selective phrase queries get cheaper,
        # not just correct)
        cand_docs = np.intersect1d(cand_docs, allow, assume_unique=True)
        if cand_docs.size == 0:
            return None, None
    if or_terms:
        u_any = None
        for t in or_terms:
            if t in term_rows:
                continue  # already a required term; its docs qualify
            rows = np.flatnonzero(row_term == t)
            if not rows.size:
                continue
            term_rows[t] = rows
            u = decode_ids(t, rows)
            u_any = u if u_any is None else np.union1d(u_any, u)
        if not any(t in uniq_terms for t in or_terms):
            if u_any is None or u_any.size == 0:
                return None, None
            cand_docs = (
                u_any
                if cand_docs is None
                else np.intersect1d(cand_docs, u_any, assume_unique=True)
            )
            if cand_docs.size == 0:
                return None, None
            if allow is not None:
                # filter context also narrows an or_terms-only candidate
                # set (no required terms: cand_docs was None above)
                cand_docs = np.intersect1d(cand_docs, allow, assume_unique=True)
                if cand_docs.size == 0:
                    return None, None
        # an or_term that is ALSO required makes the disjunction a
        # tautology over the required intersection — no extra narrowing
    per_term: dict = {}
    for t, t_rows in term_rows.items():
        ids_parts, tf_parts, dl_parts, occ_doc, occ_pos = [], [], [], [], []
        for i in t_rows:
            ids, tfs, msk = raw[i]
            cm = msk & np.isin(ids, cand_docs)
            if not cm.any():
                continue  # block holds no survivor: its positions never decode
            dls = varint_decode(pdf["dls_varint"].iloc[i]).astype(np.float64)
            pos = positions_decode(pdf["pos_varint"].iloc[i], tfs)
            em = np.repeat(cm, tfs)
            ids_parts.append(ids[cm])
            tf_parts.append(tfs[cm])
            dl_parts.append(dls[cm])
            occ_doc.append(np.repeat(ids, tfs)[em])
            occ_pos.append(pos[em])
        if not ids_parts:
            if t in uniq_terms:  # unreachable while cand ⊆ required docs
                return None, None
            continue  # an or_term with no surviving docs just drops out
        per_term[t] = (
            np.concatenate(ids_parts),
            np.concatenate(tf_parts),
            np.concatenate(dl_parts),
            np.concatenate(occ_doc),
            np.concatenate(occ_pos),
        )
    return per_term, cand_docs


def phrase_kernel(
    pdf: pd.DataFrame,
    terms_ordered: list[str],
    n_docs: int,
    avgdl: float,
    k: int,
    range_size: int,
) -> pd.DataFrame:
    """Blocks (with positions) of one doc_id range -> local top-k docs
    containing the EXACT phrase (the match_phrase half of the delegated ES
    contract, /root/reference/elastic/elastic.go:37-44 — ES's dynamic text
    mapping indexes positions by default).

    Candidate starts are the intersection over phrase slots i of
    {(doc, p - i) : p in positions(term_i, doc)} — a duplicate term in the
    phrase reuses the same position set at different offsets, so
    "a b a"-style phrases are handled for free. Matched docs score as the
    sum of their DISTINCT phrase terms' BM25 (rank semantics documented in
    phrase_topk; the DuckDB oracle mirrors it exactly). All set ops are
    vectorized (np.intersect1d on packed (doc << 32 | start) keys).
    """
    empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
        {"doc_id": "int64", "score": "float64"}
    )
    rid = int(pdf["rid"].iloc[0])
    pdf, allow, dead = _split_pseudo_rows(pdf)
    if pdf.empty:
        return empty
    row_bid = pdf["bid"].to_numpy() if "bid" in pdf.columns else None
    tdf = pdf[["term", "df"]].drop_duplicates("term")
    idf_by_term = _idf_map(tdf, n_docs)
    lo, hi = rid * range_size, (rid + 1) * range_size
    uniq_terms = sorted(set(terms_ordered))
    row_term = pdf["term"].to_numpy()
    per_term, cand_docs = _two_pass_positions(
        pdf, uniq_terms, row_term, lo, hi, dead, row_bid, allow=allow
    )
    if per_term is None:
        return empty
    cand = None
    for off, t in enumerate(terms_ordered):
        _, _, _, docs_r, pos_r = per_term[t]
        ok = pos_r >= off
        # pack (doc, candidate start) into ONE int64: the RANGE-LOCAL doc
        # offset (doc - lo < range_size <= 2^31) goes in the high bits, so
        # the packing never wraps no matter how large global doc_ids get
        keys = np.unique(((docs_r[ok] - lo) << np.int64(32)) | (pos_r[ok] - off))
        cand = keys if cand is None else np.intersect1d(cand, keys, assume_unique=True)
        if cand.size == 0:
            return empty
    matched = np.unique(cand >> np.int64(32)) + lo
    acc = np.zeros(matched.shape, dtype=np.float64)
    for t in uniq_terms:
        ids, tfs, dls, _, _ = per_term[t]
        sel = np.isin(ids, matched)
        s = _score_block(tfs[sel].astype(np.float64), dls[sel], idf_by_term[t], avgdl)
        np.add.at(acc, np.searchsorted(matched, ids[sel]), s)
    order = np.lexsort((matched, -acc))[:k]
    return pd.DataFrame({"doc_id": matched[order], "score": acc[order]}).astype(
        {"doc_id": "int64", "score": "float64"}
    )


def phrase_prefix_kernel(
    pdf: pd.DataFrame,
    fixed_ordered: list[str],
    exp_terms: list[str],
    n_docs: int,
    avgdl: float,
    k: int,
    range_size: int,
) -> pd.DataFrame:
    """Blocks (with positions) of one doc_id range -> local top-k docs
    matching the phrase `fixed_ordered + <any exp_term>` — the ES
    match_phrase_prefix kernel (query-as-you-type). Candidate starts are
    the phrase_kernel intersection over the FIXED slots, then the final
    slot is a DISJUNCTION over the prefix expansions. Matched docs score
    as sum of the distinct fixed terms' BM25 plus the BEST matched
    expansion's BM25 (the per-doc max over expansions that actually
    complete the phrase there) — deterministic and replayed exactly by
    the DuckDB oracle."""
    empty = pd.DataFrame({"doc_id": [], "score": []}).astype(_EMPTY_TOPK)
    rid = int(pdf["rid"].iloc[0])
    pdf, allow, dead = _split_pseudo_rows(pdf)
    if pdf.empty:
        return empty
    row_bid = pdf["bid"].to_numpy() if "bid" in pdf.columns else None
    tdf = pdf[["term", "df"]].drop_duplicates("term")
    idf_by_term = _idf_map(tdf, n_docs)
    lo, hi = rid * range_size, (rid + 1) * range_size
    uniq_fixed = sorted(set(fixed_ordered))
    row_term = pdf["term"].to_numpy()
    per_term, cand_docs = _two_pass_positions(
        pdf, uniq_fixed, row_term, lo, hi, dead, row_bid,
        or_terms=sorted(set(exp_terms)), allow=allow,
    )
    if per_term is None:
        return empty
    cand = None
    for off, t in enumerate(fixed_ordered):
        _, _, _, docs_r, pos_r = per_term[t]
        ok = pos_r >= off
        keys = np.unique(((docs_r[ok] - lo) << np.int64(32)) | (pos_r[ok] - off))
        cand = keys if cand is None else np.intersect1d(cand, keys, assume_unique=True)
        if cand.size == 0:
            return empty
    off_last = len(fixed_ordered)
    matched_per_e: list[tuple[str, np.ndarray]] = []
    for e in sorted(set(exp_terms)):
        if e not in per_term:
            continue
        _, _, _, docs_r, pos_r = per_term[e]
        ok = pos_r >= off_last
        keys_e = np.unique(((docs_r[ok] - lo) << np.int64(32)) | (pos_r[ok] - off_last))
        me_keys = (
            keys_e if cand is None else np.intersect1d(cand, keys_e, assume_unique=True)
        )
        if me_keys.size:
            matched_per_e.append((e, np.unique(me_keys >> np.int64(32)) + lo))
    if not matched_per_e:
        return empty
    matched = np.unique(np.concatenate([me for _, me in matched_per_e]))
    acc = np.zeros(matched.shape, dtype=np.float64)
    for t in uniq_fixed:
        ids, tfs, dls, _, _ = per_term[t]
        sel = np.isin(ids, matched)
        s = _score_block(tfs[sel].astype(np.float64), dls[sel], idf_by_term[t], avgdl)
        np.add.at(acc, np.searchsorted(matched, ids[sel]), s)
    best = np.full(matched.shape, -np.inf)
    for e, me in matched_per_e:
        ids, tfs, dls, _, _ = per_term[e]
        sel = np.isin(ids, me)
        s = _score_block(tfs[sel].astype(np.float64), dls[sel], idf_by_term[e], avgdl)
        np.maximum.at(best, np.searchsorted(matched, ids[sel]), s)
    acc += best  # every matched doc completed the phrase with >= 1 expansion
    order = np.lexsort((matched, -acc))[:k]
    return pd.DataFrame({"doc_id": matched[order], "score": acc[order]}).astype(
        _EMPTY_TOPK
    )


def _min_cover_mask(
    p: np.ndarray,
    g: np.ndarray,
    m: int,
    window: int,
    starts: np.ndarray,
    ends: np.ndarray,
) -> np.ndarray:
    """Vectorized minimal-cover window test (VERDICT r4 #7 — replaced the
    per-candidate-doc two-pointer interpreter loop): given occurrence rows
    sorted by (doc, position) and segmented into docs by starts/ends, a
    doc matches iff some occurrence range [i..j] spans < window positions
    and covers all m term groups. For each row j as the RANGE END, the
    largest valid start is i(j) = min over groups of that group's LAST
    occurrence at or before j (any later start misses a group; any
    earlier start only widens the span) — so a doc matches iff
    p[j] - p[i(j)] < window for some j with every group already seen
    inside the doc's segment. Per-group last-occurrence indices are
    running maxima over the sorted rows; rows leaking from previous docs
    are rejected by comparing against the segment start, so no per-doc
    reset is needed. O(m * n) numpy passes, m = distinct query terms.
    Returns a bool per segment."""
    n = p.size
    seg_start = np.repeat(starts, ends - starts)
    idx = np.arange(n, dtype=np.int64)
    min_last = None
    for c in range(m):
        acc = np.maximum.accumulate(np.where(g == c, idx, -1))
        min_last = acc if min_last is None else np.minimum(min_last, acc)
    covered = min_last >= seg_start  # all m groups occur within THIS doc
    ok_row = covered & ((p - p[np.maximum(min_last, 0)]) < window)
    return np.logical_or.reduceat(ok_row, starts)


def near_kernel(
    pdf: pd.DataFrame,
    terms: list[str],
    window: int,
    n_docs: int,
    avgdl: float,
    k: int,
    range_size: int,
) -> pd.DataFrame:
    """Blocks (with positions) of one doc_id range -> local top-k docs
    whose analyzed token stream contains ALL query terms within a WINDOW
    of `window` consecutive positions (any order) — proximity search, the
    unordered cousin of match_phrase. Candidate docs are the intersection
    of the terms' posting lists; the window test is the classic minimal-
    cover two-pointer sweep over each candidate's merged occurrence
    stream (O(occurrences), only for docs already known to contain every
    term). Matched docs score as the summed BM25 of the distinct query
    terms (same rank semantics as phrase_topk; the DuckDB oracle mirrors
    the window test with list slices)."""
    empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
        {"doc_id": "int64", "score": "float64"}
    )
    rid = int(pdf["rid"].iloc[0])
    pdf, allow, dead = _split_pseudo_rows(pdf)
    if pdf.empty:
        return empty
    row_bid = pdf["bid"].to_numpy() if "bid" in pdf.columns else None
    tdf = pdf[["term", "df"]].drop_duplicates("term")
    idf_by_term = _idf_map(tdf, n_docs)
    lo, hi = rid * range_size, (rid + 1) * range_size
    uniq_terms = sorted(set(terms))
    m = len(uniq_terms)
    row_term = pdf["term"].to_numpy()
    per_term, cand = _two_pass_positions(
        pdf, uniq_terms, row_term, lo, hi, dead, row_bid, allow=allow
    )
    if per_term is None:
        return empty
    d_all = np.concatenate([per_term[t][3] for t in uniq_terms])
    p_all = np.concatenate([per_term[t][4] for t in uniq_terms])
    g_all = np.concatenate(
        [np.full(per_term[t][3].shape, tid, dtype=np.int64) for tid, t in enumerate(uniq_terms)]
    )
    sel = np.isin(d_all, cand)
    order = np.lexsort((p_all[sel], d_all[sel]))
    d, p, g = d_all[sel][order], p_all[sel][order], g_all[sel][order]
    n = d.size
    starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
    ends = np.concatenate((starts[1:], [n]))
    doc_ok = _min_cover_mask(p, g, m, window, starts, ends)
    if not doc_ok.any():
        return empty
    matched = d[starts[doc_ok]]
    acc = np.zeros(matched.shape, dtype=np.float64)
    for t in uniq_terms:
        ids, tfs, dls, _, _ = per_term[t]
        s_ = np.isin(ids, matched)
        sc = _score_block(tfs[s_].astype(np.float64), dls[s_], idf_by_term[t], avgdl)
        np.add.at(acc, np.searchsorted(matched, ids[s_]), sc)
    order = np.lexsort((matched, -acc))[:k]
    return pd.DataFrame({"doc_id": matched[order], "score": acc[order]}).astype(
        {"doc_id": "int64", "score": "float64"}
    )


def multiquery_kernel(
    pdf: pd.DataFrame,
    per_q: dict[int, list[str]],
    k_by_q: dict[int, int],
    n_docs: int,
    avgdl: float,
    range_size: int,
    stride: int = STRIDE,
) -> pd.DataFrame:
    """Blocks for the UNION of all batch-query terms in ONE doc_id range ->
    each query's local top-k (query_id, doc_id, score).

    The scale fix for batch scoring (VERDICT r2 #2): a posting block is
    shuffled to its range ONCE and decoded+scored AT MOST ONCE, no matter
    how many queries share it — a stop-word block no longer replicates per
    query. Each query then runs the SAME stride-level block-max WAND loop
    as the single-query path (_bmw_range_topk) restricted to its own
    terms' rows, over a decode cache SHARED across the whole batch
    (ADVICE r3: the former exhaustive per-term decode scaled batch latency
    with total postings; now a rare-term query prunes exactly like its
    single-query run, and shared stop-word blocks are decoded once for the
    batch, lazily — never at all if no query's WAND loop reaches them).
    The query->terms map rides in the closure (per-batch metadata, a few
    KB even for 1,000 queries); scores never shuffle.
    """
    empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
        {"query_id": "int64", "doc_id": "int64", "score": "float64"}
    )
    rid = int(pdf["rid"].iloc[0])
    dead: dict = {}
    if "is_tomb" in pdf.columns:
        tm = pdf["is_tomb"].to_numpy()
        if tm.any():
            trows = pdf[tm]
            dead = {
                b: g["first_doc_id"].to_numpy().astype(np.int64)
                for b, g in trows.groupby("bid")
            }
            pdf = pdf[~tm].reset_index(drop=True)
    if pdf.empty:
        return empty
    row_bid = pdf["bid"].to_numpy() if "bid" in pdf.columns else None
    tdf = pdf[["term", "df"]].drop_duplicates("term")
    idf_by_term = _idf_map(tdf, n_docs)
    lo, hi = rid * range_size, (rid + 1) * range_size
    fd = pdf["first_doc_id"].to_numpy()
    ld = pdf["last_doc_id"].to_numpy()
    scale = pdf["scale"].to_numpy() if "scale" in pdf.columns else 1.0
    bms = pdf["block_max_tfnorm"].to_numpy() * pdf["term"].map(idf_by_term).to_numpy() * scale
    row_term = pdf["term"].to_numpy()

    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # SHARED across queries

    def decode(i: int) -> tuple[np.ndarray, np.ndarray]:
        if i not in decoded:
            ids = delta_decode_ids(pdf["doc_ids_varint"].iloc[i])
            tfs = varint_decode(pdf["tfs_varint"].iloc[i]).astype(np.float64)
            dls = varint_decode(pdf["dls_varint"].iloc[i]).astype(np.float64)
            sc = _score_block(tfs, dls, idf_by_term[row_term[i]], avgdl)
            m = (ids >= lo) & (ids < hi)
            if dead and row_bid is not None:
                dd = dead.get(row_bid[i])
                if dd is not None and dd.size:
                    m &= ~np.isin(ids, dd)
            decoded[i] = (ids[m], sc[m])
        return decoded[i]

    term_rows = {t: np.flatnonzero(row_term == t) for t in np.unique(row_term)}
    frames = []
    for qid, terms in per_q.items():
        idxs = [term_rows[t] for t in terms if t in term_rows]
        if not idxs:
            continue
        # ascending row order: candidate concatenation order then matches
        # the single-query kernel exactly (bit-identical scores)
        sub = np.sort(np.concatenate(idxs))
        d_out, s_out = _bmw_range_topk(
            sub, row_term, fd, ld, bms, decode, k_by_q[qid], lo, range_size, stride
        )
        if d_out.size:
            frames.append(
                pd.DataFrame({"query_id": qid, "doc_id": d_out, "score": s_out})
            )
    if not frames:
        return empty
    return pd.concat(frames, ignore_index=True).astype(
        {"query_id": "int64", "doc_id": "int64", "score": "float64"}
    )


class IndexReader:
    """Query-side handle on a published build."""

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        build_id: str | None = None,
        build_ids: list[str] | None = None,
    ):
        from ..sources.segments import SegmentStore, term_bucket_py

        self._term_bucket_py = term_bucket_py
        self.spark = spark
        self.out_dir = out_dir
        store = SegmentStore(out_dir)
        if build_ids is None:
            build_ids = [build_id] if build_id else store.live_builds()
        if not build_ids:
            raise FileNotFoundError(f"no live build in {out_dir}")
        self.build_ids = build_ids
        self.build_id = build_ids[-1]
        self.bdirs = [store.build_dir(b) for b in build_ids]
        self.bdir = self.bdirs[-1]
        self.build_stats = []
        for d in self.bdirs:
            with open(os.path.join(d, "stats.json")) as f:
                self.build_stats.append(json.load(f))
        # query-time GLOBAL stats across the live segment set: the segments
        # were built independently (each with its own N/avgdl), but BM25
        # must score against the whole corpus — df summed per term, N
        # summed, avgdl from total token mass. This is the merge-on-read
        # half of the "distributed multi-way posting merge".
        n_total = sum(st["N"] for st in self.build_stats)
        tok_total = sum(st.get("total_tokens", int(round(st["N"] * st["avgdl"]))) for st in self.build_stats)
        # per-doc overwrite (tombstones): dead versions leave N/avgdl
        # immediately (markers written at ingest); per-term df stays
        # overcounted until compaction — Lucene's deleted-docs semantics.
        n_dead, tok_dead = 0, 0
        for d in self.bdirs:
            p = os.path.join(d, "_tombstones.json")
            if os.path.exists(p):
                with open(p) as f:
                    tm = json.load(f)
                n_dead += tm["n"]
                tok_dead += tm["doc_len_sum"]
        self.has_tombstones = n_dead > 0
        self.stats = dict(self.build_stats[-1])
        self.stats["N"] = n_total - n_dead
        # `or 1.0`: a fully-deleted store has zero live tokens; any
        # positive avgdl keeps the kernels' arithmetic finite (no live
        # doc can score regardless)
        self.stats["avgdl"] = (tok_total - tok_dead) / max(n_total - n_dead, 1) or 1.0
        # multifield store (build_multifield_index): merge PER-FIELD stats
        # across live builds the same way — N and token mass summed, avgdl
        # from the totals (single build: the stored avgdl, bit-identical
        # to build time). None when any live build is single-field.
        self.field_stats: dict | None = None
        self.primary_field: str | None = None
        if self.build_stats and all("fields" in st for st in self.build_stats):
            prim = self.build_stats[-1].get("primary")
            if all(st.get("primary") == prim for st in self.build_stats):
                merged: dict[str, dict] = {}
                for st in self.build_stats:
                    for fname, s in st["fields"].items():
                        m = merged.setdefault(fname, {"N": 0, "total_tokens": 0})
                        m["N"] += int(s["N"])
                        m["total_tokens"] += int(s["total_tokens"])
                for fname, m in merged.items():
                    if len(self.build_stats) == 1:
                        m["avgdl"] = float(self.build_stats[0]["fields"][fname]["avgdl"])
                    else:
                        m["avgdl"] = m["total_tokens"] / max(m["N"], 1) or 1.0
                self.field_stats = merged
                self.primary_field = prim
        # Artifact schemas are fixed by the writer (segments._build_from_tf),
        # so prefill the per-kind schema cache with static DDL instead of
        # sniffing parquet footers: a bare spark.read.parquet costs a
        # one-task footer job per kind, which lands inside the FIRST query's
        # wall time (cold serve latency) — with the prefill no query ever
        # pays it.
        from pyspark.sql.types import StructType

        from .postings import POSTINGS_SCHEMA

        self._schemas: dict = {
            "blocks": StructType.fromDDL(POSTINGS_SCHEMA),
            "terms": StructType.fromDDL("term string, df long"),
            "ngrams": StructType.fromDDL("ng string, term string, df long"),
            "docmap": StructType.fromDDL(
                "doc_id long, repo string, path string, commit string, "
                "lang string, doc_len long, content_sha string"
            ),
        }

    def _read_parquet(self, dirs: list[str], kind: str) -> DataFrame:
        """Parquet read with a per-reader schema cache: every bare
        spark.read.parquet costs a one-task footer-sniff job; segments of
        one index share a writer schema, so after the first query the
        sniff jobs disappear (2 fewer jobs per warm top-k)."""
        cached = self._schemas.get(kind)
        if cached is not None:
            return self.spark.read.schema(cached).parquet(*dirs)
        df = self.spark.read.parquet(*dirs)
        self._schemas[kind] = df.schema
        return df

    def _terms_dirs(self) -> list[str]:
        """Every terms bucket dir across live segments (the vocabulary —
        tiny next to the postings); shared by the full-vocabulary scans
        (fuzzy/suggest/MLT/substring expansion)."""
        dirs = []
        for d, st in zip(self.bdirs, self.build_stats):
            for b in range(st["n_buckets"]):
                p = os.path.join(d, "terms", f"bucket={b}")
                if os.path.exists(p):
                    dirs.append(p)
        return dirs

    def _tombstones_df(self) -> DataFrame | None:
        if not self.has_tombstones:
            return None
        from ..sources.segments import SegmentStore, TOMB_SCHEMA, tombstone_dirs

        dirs = tombstone_dirs(SegmentStore(self.out_dir), self.build_ids)
        if not dirs:
            # markers say dead docs exist but no kb=<b> bucket dirs were
            # found: this is a pre-bucketed-layout store (or a corrupted
            # one). Returning None here would SILENTLY stop masking
            # overwritten versions — fail loudly instead.
            raise RuntimeError(
                f"index at {self.out_dir} records tombstones but has no "
                f"kb=<b> tombstone buckets — store predates the bucketed "
                f"docmap layout. Re-run compact() (or rebuild) to migrate."
            )
        return self.spark.read.schema(TOMB_SCHEMA).parquet(*dirs)

    def _tomb_ranged(self, range_size: int) -> DataFrame | None:
        """Tombstones as pseudo-block rows keyed by the same rid partition
        as the posting blocks — the dead sets travel in the SAME shuffle,
        fully distributed (never a driver-held set)."""
        t = self._tombstones_df()
        if t is None:
            return None
        return t.select(
            F.col("dead_build").alias("bid"),
            F.col("doc_id").alias("first_doc_id"),
            F.col("doc_id").alias("last_doc_id"),
            (F.col("doc_id") / range_size).cast("long").alias("rid"),
            F.lit(True).alias("is_tomb"),
        )

    def docmap(self) -> DataFrame:
        from ..sources.segments import BID_PATTERN, SegmentStore, docmap_dirs

        # kb=<b> leaf dirs enumerated driver-side (one multi-root read of
        # partitioned dirs is rejected by Spark's partition discovery)
        dm = self._read_parquet(
            docmap_dirs(SegmentStore(self.out_dir), self.build_ids), "docmap"
        )
        t = self._tombstones_df()
        if t is None:
            return dm
        dm = dm.withColumn(
            "bid", F.regexp_extract(F.col("_metadata.file_path"), BID_PATTERN, 1)
        )
        return dm.join(
            t.select(F.col("dead_build").alias("bid"), "doc_id"), ["bid", "doc_id"], "left_anti"
        ).drop("bid")

    def mget(self, doc_ids: list[int]) -> DataFrame:
        """ES `_mget`: fetch live documents by id in one request (the
        delegated ES document surface; /root/reference/elastic/elastic.go
        passes doc APIs straight through). One tombstone-masked docmap
        read with the id IN-list pushed to the parquet scan; ids whose
        doc is dead (overwritten or deleted) or absent come back with
        found=false and null attributes — never a stale version, exactly
        the merge-on-read contract every query path honors.

        Scale shape: the asked-ids side is a tiny driver-local DataFrame
        broadcast into the join; the docmap side is the same pruned
        kb=<b> union-read docmap() always does, with row-group skipping
        from the pushed IN filter. Cost ∝ docmap scan, never content."""
        ids = sorted({int(i) for i in doc_ids})
        if not ids:
            raise ValueError("mget needs at least one doc id")
        asked = self.spark.createDataFrame([(i,) for i in ids], "doc_id long")
        hit = self.docmap().filter(F.col("doc_id").isin(ids))
        return (
            asked.join(F.broadcast(hit), "doc_id", "left")
            .select(
                "doc_id",
                F.col("repo").isNotNull().alias("found"),
                "repo",
                "path",
                "commit",
                "lang",
                "doc_len",
                "content_sha",
            )
            .orderBy("doc_id")
        )

    def _bucket_dirs(self, terms: list[str], sub: str | None = None) -> list[str]:
        """Matching bucket=<b> leaf dirs across ALL live segments (each
        segment may have its own n_buckets). Only directories that can
        contain a query term are listed at all — partition pruning by
        construction, before Spark sees a path."""
        out = []
        for d, st in zip(self.bdirs, self.build_stats):
            root = os.path.join(d, sub) if sub else d
            for b in sorted({self._term_bucket_py(t, st["n_buckets"]) for t in terms}):
                p = os.path.join(root, f"bucket={b}")
                if os.path.exists(p):
                    out.append(p)
        return out

    def _df_for_terms(self, terms: list[str]) -> DataFrame | None:
        """GLOBAL df per query term: ONE union-read over every live
        segment's matching term buckets (pushed-down `term IN`), summed in
        Spark. Job count is constant in the number of live segments."""
        dirs = self._bucket_dirs(terms, "terms")
        if not dirs:
            return None
        return (
            self._read_parquet(dirs, "terms")
            .filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
        )

    def _blocks_for_terms(
        self, terms: list[str], with_positions: bool = False
    ) -> DataFrame | None:
        """All matching posting blocks across ALL live segments in ONE
        read (one InMemoryFileIndex, one Spark job when consumed). The
        per-segment block-max bound correction is derived from the file
        path (builds/<id>/...) via a tiny literal map, not per-part reads;
        the term's GLOBAL df is derived from the blocks THEMSELVES — a
        posting block stores its doc count (n_docs), and a term's df is
        exactly the sum of its blocks' n_docs across live segments, so a
        window-sum over the already-pruned block rows replaces the former
        terms-table read + broadcast materialization (two fewer jobs per
        warm query; the window exchange moves only the pruned block rows).

        with_positions=False drops the pos_varint column BEFORE the range
        shuffle (and Catalyst prunes it from the parquet scan), so plain
        BM25 queries never pay for the positions stream."""
        avgdl_q = self.stats["avgdl"]
        dirs = self._bucket_dirs(terms)
        if not dirs:
            return None
        # tombstone-only builds (delete_by_query) have avgdl == 0 and no
        # blocks — their scale is never consulted, any finite value works
        scale_by_build = {
            bid: max(1.0, avgdl_q / st["avgdl"]) if st["avgdl"] > 0 else 1.0
            for bid, st in zip(self.build_ids, self.build_stats)
        }
        from ..sources.segments import BID_PATTERN

        mapping = F.create_map(
            *[F.lit(x) for kv in scale_by_build.items() for x in kv]
        )
        bid = F.regexp_extract(F.col("_metadata.file_path"), BID_PATTERN, 1)
        blocks = (
            self._read_parquet(dirs, "blocks")
            .filter(F.col("term").isin(terms))
            .withColumn("bid", bid)
            .withColumn("scale", F.element_at(mapping, F.col("bid")))
        )
        if not with_positions:
            blocks = blocks.drop("pos_varint")
        return blocks.withColumn(
            "df", F.sum("n_docs").over(Window.partitionBy("term")).cast("long")
        )

    def idf_for_terms(self, terms: list[str]) -> dict[str, float]:
        """Driver-side idf lookup (kept for diagnostics/tests; the query
        path no longer calls this — df rides along with the blocks)."""
        import numpy as np

        n_docs = self.stats["N"]
        dfs = self._df_for_terms(terms)
        if dfs is None:
            return {}
        rows = dfs.collect()
        return _idf_map(
            {"term": [r["term"] for r in rows], "df": [int(r["df"]) for r in rows]},
            n_docs,
        )

    def _prefix_terms_df(self, prefix: str, max_terms: int = 256) -> DataFrame | None:
        """Edge-ngram prefix expansion AS A PLAN: ngram-bucket read with a
        pushed-down `ng =` predicate, per-term df summed across segments,
        capped at max_terms by (df desc, term asc) INSIDE Spark — compiles
        to TakeOrderedAndProject, so only max_terms rows ever reach the
        driver (an unbounded 2-char prefix over a 100x code vocabulary
        stays executor-side)."""
        from ..analyze import NGRAM_MAX, NGRAM_MIN, tokenize_py as _tok

        norm = _tok(prefix)
        if not norm:
            return None
        ng = norm[0][:NGRAM_MAX]
        if len(ng) < NGRAM_MIN:
            return None
        dirs = self._bucket_dirs([ng], "ngrams")
        if not dirs:
            return None
        return (
            self._read_parquet(dirs, "ngrams")
            .filter(F.col("ng") == ng)
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(max_terms)
        )

    def expand_prefix(self, prefix: str, max_terms: int = 256) -> list[str]:
        """Edge-ngram prefix expansion (E1 fallback): prefix -> index terms.

        The prefix is truncated to the indexed max gram (8); the dominant-
        df terms carry the ranking signal. The cap is a TakeOrdered inside
        Spark (see _prefix_terms_df) — at most max_terms rows collect."""
        ranked = self._prefix_terms_df(prefix, max_terms)
        if ranked is None:
            return []
        return [r["term"] for r in ranked.collect()]

    def _vocab(self, terms_df: DataFrame) -> DataFrame:
        """Restrict a terms-table scan to the PRIMARY field's vocabulary.
        On a multifield store secondary fields' terms are namespaced
        "<field>:<term>" (analyzed tokens are alnum-only, so ':' can
        never appear in a bare term); every vocabulary-expansion verb
        (wildcard/grep expansion, fuzzy, suggest fallback) must exclude
        them or a pattern could silently match another field's tokens —
        with the wrong df/avgdl pairing to boot. No-op on single-field
        stores."""
        if self.field_stats is None:
            return terms_df
        return terms_df.filter(~F.col("term").contains(":"))

    def terms_containing(self, needle: str, max_terms: int = 4096) -> list[str] | None:
        """ALL index terms containing `needle` as a substring, across every
        live segment — the vocabulary expansion for index-accelerated regex
        search (operators.text.regex_search_indexed). Substring matching
        cannot prune the crc32 hash buckets, so this scans the TERMS tables
        (the vocabulary — tiny next to the postings, let alone the corpus).
        Returns None when more than max_terms match: a capped expansion
        would be UNSOUND as a prefilter (a dropped term drops its docs), so
        the caller must fall back to the full scan."""
        dirs = self._terms_dirs()
        if not dirs:
            return []
        rows = (
            self._vocab(self._read_parquet(dirs, "terms"))
            .filter(F.col("term").contains(needle))
            .select("term")
            .distinct()
            .limit(max_terms + 1)
            .collect()
        )
        if len(rows) > max_terms:
            return None
        return sorted(r["term"] for r in rows)

    def wildcard_topk(
        self,
        pattern: str,
        k: int = 10,
        max_terms: int = 4096,
        **kw,
    ) -> DataFrame:
        """ES `wildcard` query, scoped to edge anchors: `core*` (prefix),
        `*core` (suffix) and `*core*` (infix). The core expands against
        the index vocabulary — prefix via the edge-ngram machinery, infix
        and suffix via ONE terms-table scan (the accelerated-grep
        expansion) — and the union scores as a disjunctive BM25 query
        through the block-max WAND kernel, each expanded term with its
        own df/idf (the same query-expansion semantics prefix_topk
        documents). Inner wildcards raise; an expansion past `max_terms`
        raises loudly (an unselective pattern would silently become a
        corpus scan — the caller should use regex_search for that
        shape)."""
        from ..analyze import tokenize_py as _tok

        core = pattern.strip("*")
        stars = len(pattern) - len(core)
        if not core or "*" in core or stars != pattern.count("*") or stars == 0:
            raise ValueError(
                f"wildcard pattern {pattern!r}: edge anchors only "
                "(core*, *core, *core*), non-empty core"
            )
        toks = _tok(core)
        if len(toks) != 1:
            raise ValueError(f"wildcard core must analyze to one token, got {toks}")
        core = toks[0]
        if pattern.endswith("*") and not pattern.startswith("*"):
            return self.prefix_topk(core, k, **kw)
        cands = self.terms_containing(core, max_terms=max_terms)
        if cands is None:
            raise ValueError(
                f"wildcard {pattern!r} expands past {max_terms} vocabulary "
                "terms; use regex_search for unselective patterns"
            )
        if not pattern.endswith("*"):  # *core: suffix anchor
            cands = [t for t in cands if t.endswith(core)]
        return self._topk_terms(sorted(cands), k, **kw)

    def regexp_topk(
        self,
        pattern: str,
        k: int = 10,
        max_terms: int = 4096,
        **kw,
    ) -> DataFrame:
        """ES `regexp` query: the pattern must match the WHOLE term (ES
        anchoring semantics), matching vocabulary terms expand to a
        disjunctive BM25 WAND query — each term with its own df/idf,
        exactly the wildcard/prefix expansion contract. The dialect is
        Java regex (Spark `rlike`), a superset of the Lucene operators ES
        exposes; expansions past `max_terms` raise loudly (unselective
        patterns belong to regex_search, which greps CONTENT rather than
        ranking by vocabulary match). One primary-field vocabulary scan
        (self._vocab — namespaced multifield terms excluded)."""
        dirs = self._terms_dirs()
        if not dirs:
            return self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        rows = (
            self._vocab(self._read_parquet(dirs, "terms"))
            .filter(F.col("term").rlike(f"^(?:{pattern})$"))
            .select("term")
            .distinct()
            .limit(max_terms + 1)
            .collect()
        )
        if len(rows) > max_terms:
            raise ValueError(
                f"regexp {pattern!r} expands past {max_terms} vocabulary "
                "terms; use regex_search for unselective patterns"
            )
        return self._topk_terms(sorted(r["term"] for r in rows), k, **kw)

    def fuzzy_terms(
        self,
        token: str,
        max_dist: int = 1,
        prefix_len: int = 1,
        max_terms: int = 64,
    ) -> list[str]:
        """Vocabulary expansion for a fuzzy (edit-distance) query token:
        index terms within Levenshtein distance <= max_dist of `token`,
        sharing its first `prefix_len` characters (ES's fuzzy
        prefix_length, which keeps the expansion anchored and cheap — the
        delegated ES match surface accepts `fuzziness` on exactly this
        contract, /root/reference/elastic/elastic.go:103-117's
        Search passthrough). The scan touches only the TERMS tables (the
        vocabulary — tiny next to the postings) with a pushed length-band
        + prefix filter; levenshtein() is a Catalyst builtin, so the whole
        expansion is one JVM-side job collecting at most max_terms rows.
        Deterministic cap order: (distance ASC, term ASC) — df-free, so a
        DuckDB oracle over the raw corpus replays it exactly."""
        if not token:
            return []
        dirs = self._terms_dirs()
        if not dirs:
            return []
        cond = F.abs(F.length("term") - F.lit(len(token))) <= max_dist
        if prefix_len > 0:
            cond = cond & F.col("term").startswith(token[:prefix_len])
        rows = (
            self._vocab(self._read_parquet(dirs, "terms"))
            .filter(cond)
            .select("term")
            .distinct()
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(token)))
            .filter(F.col("dist") <= max_dist)
            .orderBy(F.asc("dist"), F.asc("term"))
            .limit(max_terms)
            .collect()
        )
        return [r["term"] for r in rows]

    def fuzzy_topk(
        self,
        query: str,
        k: int = 10,
        max_dist: int = 1,
        prefix_len: int = 1,
        max_terms: int = 64,
        **kw,
    ) -> DataFrame:
        """Typo-tolerant top-k: each analyzed query token expands to its
        fuzzy vocabulary variants (fuzzy_terms), and the union scores as a
        disjunctive BM25 query through the block-max WAND kernel — each
        expanded term with its own df/idf, the same query-expansion
        semantics prefix_topk documents. Variants shared by two query
        tokens count once (set union)."""
        variants = self.fuzzy_terms_many(
            sorted(set(tokenize_py(query))),
            max_dist=max_dist,
            prefix_len=prefix_len,
            max_terms=max_terms,
        )
        return self._topk_terms(sorted({t for ts in variants.values() for t in ts}), k, **kw)

    def fuzzy_terms_many(
        self,
        tokens: list[str],
        max_dist: int = 1,
        prefix_len: int = 1,
        max_terms: int = 64,
    ) -> dict[str, list[str]]:
        """Batched fuzzy expansion: ALL query tokens against the
        vocabulary in ONE job (one terms-table scan, however many tokens),
        instead of a scan per token — at a large-corpus vocabulary the
        scan dominates, so a q-token query must not pay it q times. The
        tiny token list broadcasts against the vocabulary with the pushed
        length-band/prefix disjunction; per-token ranking is a
        row_number window over (distance, term) — the window exchange
        moves only rows already within some token's band."""
        tokens = [t for t in tokens if t]
        if not tokens:
            return {}
        dirs = self._terms_dirs()
        if not dirs:
            return {t: [] for t in tokens}
        prune = None
        for t in tokens:
            c = F.abs(F.length("term") - F.lit(len(t))) <= max_dist
            if prefix_len > 0:
                c = c & F.col("term").startswith(t[: prefix_len])
            prune = c if prune is None else (prune | c)
        tok_df = self.spark.createDataFrame([(t,) for t in tokens], "tok string")
        vocab = self._vocab(self._read_parquet(dirs, "terms")).filter(prune).select("term").distinct()
        join_cond = F.abs(F.length("term") - F.length("tok")) <= max_dist
        if prefix_len > 0:
            join_cond = join_cond & (
                F.substring("term", 1, prefix_len) == F.substring("tok", 1, prefix_len)
            )
        pairs = (
            vocab.join(F.broadcast(tok_df), join_cond)
            .withColumn("dist", F.levenshtein(F.col("term"), F.col("tok")))
            .filter(F.col("dist") <= max_dist)
        )
        w = Window.partitionBy("tok").orderBy(F.asc("dist"), F.asc("term"))
        rows = (
            pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= max_terms)
            .select("tok", "term")
            .collect()
        )
        out: dict[str, list[str]] = {t: [] for t in tokens}
        for r in rows:
            out[r["tok"]].append(r["term"])
        return {t: sorted(v) for t, v in out.items()}

    def suggest_terms(self, prefix: str, size: int = 10) -> DataFrame:
        """ES completion suggester over the index vocabulary (the suggest
        half of the delegated search surface,
        /root/reference/elastic/elastic.go search passthrough): terms
        completing the analyzed prefix, ranked by corpus document
        frequency — (term, df), df desc then term asc.

        Plan: when the prefix fits an indexed edge-ngram, the ngram
        buckets are partition-pruned driver-side and the `ng =` equality
        pushes into the scan (_prefix_terms_df — the same machinery
        prefix search uses); longer prefixes fall back to ONE terms-table
        scan with a pushed startswith range filter. Either way df sums
        across live segments and the cap compiles to TakeOrdered — only
        `size` rows reach the driver. Like every vocabulary read, df
        counts tombstoned docs until compaction (documented drift)."""
        from ..analyze import NGRAM_MAX, NGRAM_MIN, tokenize_py as _tok

        empty = self.spark.createDataFrame([], "term string, df long")
        norm = _tok(prefix)
        if not norm:
            return empty
        p = norm[0]
        if NGRAM_MIN <= len(p) <= NGRAM_MAX:
            ranked = self._prefix_terms_df(p, max_terms=size)
            if ranked is None:
                return empty
            return ranked.select("term", F.col("df").cast("long").alias("df"))
        dirs = self._terms_dirs()
        if not dirs:
            return empty
        return (
            self._vocab(self._read_parquet(dirs, "terms"))
            .filter(F.col("term").startswith(p))
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(size)
        )

    def suggest_corrections(
        self,
        token: str,
        size: int = 10,
        max_dist: int = 2,
        prefix_len: int = 1,
    ) -> DataFrame:
        """ES term suggester (did-you-mean): vocabulary terms within
        Levenshtein `max_dist` of the analyzed token and sharing its
        `prefix_len`-character prefix (the ES prefix_length contract),
        ranked (distance asc, df desc, term asc) — (term, dist, df).

        ONE pruned vocabulary scan: the length band + prefix conjunction
        pushes into the terms read, per-term df aggregates across live
        segments map-side-first, distance evaluates on the AGGREGATED
        vocabulary rows (codegen levenshtein over |vocab| rows, never
        |vocab| x segments), and the cap compiles to TakeOrdered."""
        empty = self.spark.createDataFrame([], "term string, dist int, df long")
        norm = tokenize_py(token)
        if not norm:
            return empty
        t = norm[0]
        dirs = self._terms_dirs()
        if not dirs:
            return empty
        cond = F.abs(F.length("term") - F.lit(len(t))) <= max_dist
        if prefix_len > 0:
            cond = cond & F.col("term").startswith(t[:prefix_len])
        return (
            self._vocab(self._read_parquet(dirs, "terms"))
            .filter(cond)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
            .withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)).cast("int"))
            .filter(F.col("dist") <= max_dist)
            .select("term", "dist", "df")
            .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
            .limit(size)
        )

    def highlight_topk(
        self,
        docs: DataFrame,
        query: str,
        k: int = 10,
        window: int = 5,
        **kw,
    ) -> DataFrame:
        """Top-k with snippets — the ES highlight surface over the
        delegated search endpoint (the reference's map UI renders the hit
        source directly; ES highlighting is the standard upgrade). Ranking
        comes from the pruned WAND top-k; ONLY the k winners are joined
        back to the corpus (broadcast semi of k ids — the content scan
        never touches non-winners at any corpus size) and re-analyzed
        Catalyst-side to cut a deterministic snippet: the `window` tokens
        on each side of the FIRST occurrence of any query term (earliest
        token index; term-order tie-break is irrelevant since positions
        are distinct), plus that matched term. Returns
        (doc_id, score, first_term, snippet)."""
        from ..analyze import tokenize_expr

        terms = sorted(set(tokenize_py(query)))
        top = self._topk_terms(terms, k, **kw).collect()  # O(k) rows
        if not top:
            return self.spark.createDataFrame(
                [], "doc_id long, score double, first_term string, snippet string"
            )
        scores = self.spark.createDataFrame(
            [(r["doc_id"], r["score"]) for r in top], "doc_id long, score double"
        )
        # the winner ids are a LITERAL IN-list, so the corpus scan prunes
        # to k docs at the parquet reader (PushedFilters), instead of a
        # full content read feeding a broadcast join
        hits = docs.filter(
            F.col("doc_id").isin([r["doc_id"] for r in top])
        ).join(F.broadcast(scores), "doc_id")
        toks = tokenize_expr("content")
        pos_arr = F.array(
            *[F.array_position(F.col("t"), F.lit(t)) for t in terms]
        )
        first = F.array_min(F.filter(pos_arr, lambda p: p > 0))
        start = F.greatest(first - window, F.lit(1))
        length = first + window - start + 1
        return (
            hits.withColumn("t", toks)
            .withColumn("first_pos", first)
            .withColumn(
                "first_term", F.element_at(F.col("t"), F.col("first_pos").cast("int"))
            )
            .withColumn(
                "snippet",
                F.concat_ws(
                    " ", F.slice(F.col("t"), start.cast("int"), length.cast("int"))
                ),
            )
            .select("doc_id", "score", "first_term", "snippet")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def highlight_phrase_topk(
        self,
        docs: DataFrame,
        phrase: str,
        k: int = 10,
        window: int = 5,
        **kw,
    ) -> DataFrame:
        """Phrase-ranked highlighting: ranking comes from phrase_topk
        (positions decode, exact adjacency), and the snippet centers on
        the FIRST occurrence of the WHOLE phrase — `window` tokens each
        side of the consecutive match, plus the matched tokens. Same O(k)
        re-read contract as highlight_topk (winner ids are a pushed
        IN-list; non-winners never touch the content scan). Returns
        (doc_id, score, matched, snippet)."""
        from ..analyze import tokenize_expr

        seq = tokenize_py(phrase)
        if not seq:
            return self.spark.createDataFrame(
                [], "doc_id long, score double, matched string, snippet string"
            )
        top = self.phrase_topk(phrase, k, **kw).collect()  # O(k) rows
        if not top:
            return self.spark.createDataFrame(
                [], "doc_id long, score double, matched string, snippet string"
            )
        scores = self.spark.createDataFrame(
            [(r["doc_id"], r["score"]) for r in top], "doc_id long, score double"
        )
        hits = docs.filter(
            F.col("doc_id").isin([r["doc_id"] for r in top])
        ).join(F.broadcast(scores), "doc_id")
        n = len(seq)
        pat = F.array(*[F.lit(t) for t in seq])
        starts = F.filter(
            F.sequence(F.lit(1), F.greatest(F.size("t") - n + 1, F.lit(0))),
            lambda i: F.slice(F.col("t"), i, n) == pat,
        )
        first = F.array_min(starts)
        s0 = F.greatest(first - window, F.lit(1))
        length = first + n - 1 + window - s0 + 1
        return (
            hits.withColumn("t", tokenize_expr("content"))
            .withColumn("first_pos", first)
            .withColumn(
                "matched",
                F.concat_ws(" ", F.slice(F.col("t"), F.col("first_pos").cast("int"), n)),
            )
            .withColumn(
                "snippet",
                F.concat_ws(" ", F.slice(F.col("t"), s0.cast("int"), length.cast("int"))),
            )
            .select("doc_id", "score", "matched", "snippet")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def more_like_this(
        self,
        docs: DataFrame,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 10,
        **kw,
    ) -> DataFrame:
        """ES more_like_this over the delegated search surface: find docs
        similar to a source doc. Deterministic contract: the source doc's
        terms rank by tf_in_doc x BM25-idf (df summed off the TERMS
        tables — index metadata, no corpus pass), the top max_query_terms
        (score desc, term asc) form a disjunctive BM25 query, and the
        source doc itself is excluded from the hits. Driver-side work is
        O(1 doc + |doc terms| metadata rows): the source content fetch is
        a pushed doc_id filter, the df fetch touches only the pruned
        vocabulary rows."""
        from collections import Counter

        from ..functions.bm25 import idf_py

        empty = self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        row = (
            docs.filter(F.col("doc_id") == doc_id).select("content").collect()
        )
        if not row:
            return empty
        tf = Counter(tokenize_py(row[0]["content"]))
        if not tf:
            return empty
        terms = sorted(tf)
        dirs = self._terms_dirs()
        df_rows = (
            self._read_parquet(dirs, "terms")
            .filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
            .collect()
        )
        n = self.stats["N"]
        dfm = {r["term"]: int(r["df"]) for r in df_rows}
        ranked = sorted(
            ((tf[t] * idf_py(dfm[t], n), t) for t in terms if t in dfm),
            key=lambda st_: (-st_[0], st_[1]),
        )
        selected = sorted(t for _, t in ranked[:max_query_terms])
        if not selected:
            return empty
        out = self._topk_terms(selected, k + 1, **kw)
        return (
            out.filter(F.col("doc_id") != doc_id)
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def explain_score(self, doc_id: int, query: str) -> DataFrame:
        """ES `_explain` parity: the per-term BM25 breakdown of one
        (query, doc) pair — (term, tf, doc_len, df, idf, tf_norm, score).
        Pruned end-to-end: bucket dirs + pushed `term IN` select the
        query's blocks, the GLOBAL df window rides the pruned rows
        (_blocks_for_terms), then a pushed first/last_doc_id range filter
        keeps only blocks COVERING the doc (parquet min/max stats skip the
        rest), and the Arrow kernel decodes just those few blocks to
        locate the doc. Tombstoned versions: like every decode path, an
        overwritten doc explains as absent only after compaction drops its
        blocks; the live-version numbers are correct throughout."""
        terms = sorted(set(tokenize_py(query)))
        out_schema = (
            "term string, tf long, doc_len long, df long, "
            "idf double, tf_norm double, score double"
        )
        empty = self.spark.createDataFrame([], out_schema)
        if not terms:
            return empty
        blocks = self._blocks_for_terms(terms)
        if blocks is None:
            return empty
        covering = blocks.filter(
            (F.col("first_doc_id") <= doc_id) & (F.col("last_doc_id") >= doc_id)
        ).select("term", "df", "doc_ids_varint", "tfs_varint", "dls_varint")

        def kernel(batches):
            import pyarrow as pa

            for rb in batches:
                t_out, tf_out, dl_out, df_out = [], [], [], []
                cols = {n: rb.column(i) for i, n in enumerate(rb.schema.names)}
                for i in range(rb.num_rows):
                    ids = delta_decode_ids(cols["doc_ids_varint"][i].as_py())
                    j = np.searchsorted(ids, doc_id)
                    if j < len(ids) and ids[j] == doc_id:
                        tfs = varint_decode(cols["tfs_varint"][i].as_py())
                        dls = varint_decode(cols["dls_varint"][i].as_py())
                        t_out.append(cols["term"][i].as_py())
                        tf_out.append(int(tfs[j]))
                        dl_out.append(int(dls[j]))
                        df_out.append(int(cols["df"][i].as_py()))
                if t_out:
                    yield pa.record_batch(
                        [
                            pa.array(t_out, pa.string()),
                            pa.array(tf_out, pa.int64()),
                            pa.array(dl_out, pa.int64()),
                            pa.array(df_out, pa.int64()),
                        ],
                        ["term", "tf", "doc_len", "df"],
                    )

        from ..functions.bm25 import idf_expr, tf_norm_expr

        n, avgdl = self.stats["N"], self.stats["avgdl"]
        hit = covering.mapInArrow(kernel, "term string, tf long, doc_len long, df long")
        return (
            hit.withColumn("idf", idf_expr(F.col("df"), n))
            .withColumn("tf_norm", tf_norm_expr(F.col("tf"), F.col("doc_len"), avgdl))
            .withColumn("score", F.col("idf") * F.col("tf_norm"))
            .orderBy("term")
        )

    def match_count(self, query: str) -> DataFrame:
        """ES `_count` parity: the exact number of docs matching an OR
        query, without scoring or top-k. Candidate ids off the pruned
        posting blocks (only doc_ids_varint decodes — for an OR match a
        candidate IS a match), masked to live docs by an id-only
        semi-join against the tombstone-filtered docmap, then count(*) —
        a partial-aggregated scalar, no sort anywhere."""
        terms = sorted(set(tokenize_py(query)))
        out_schema = "n_docs long"
        if not terms:
            return self.spark.createDataFrame([(0,)], out_schema)
        return (
            self.docmap()
            .select("doc_id")
            .join(self.candidate_doc_ids(terms), "doc_id", "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        )

    def term_vectors(self, docs: DataFrame, doc_id: int) -> DataFrame:
        """ES `_termvectors` parity: one doc's (term, tf, df, positions).
        Like ES for non-stored fields, the source doc is RE-ANALYZED —
        a pushed doc_id point lookup fetches the one content row (parquet
        min/max skip everything else), the driver tokenizes that single
        doc (O(doc_len), the same analyzer the index used, so positions
        match the index's positions stream), and df comes from the
        index's terms tables under a pushed `term IN` over bucket-pruned
        dirs. Terms the index has not (yet) seen report df=0 — exactly
        the stale-df window any per-segment stats API has."""
        out_schema = "term string, tf long, df long, positions array<int>"
        empty = self.spark.createDataFrame([], out_schema)
        rows = docs.filter(F.col("doc_id") == doc_id).select("content").collect()
        if not rows:
            return empty
        toks = tokenize_py(rows[0]["content"])
        if not toks:
            return empty
        by_term: dict[str, list[int]] = {}
        for p, t in enumerate(toks):
            by_term.setdefault(t, []).append(p)
        local = self.spark.createDataFrame(
            [(t, len(ps), ps) for t, ps in sorted(by_term.items())],
            "term string, tf long, positions array<int>",
        )
        dfs = self._df_for_terms(sorted(by_term))
        if dfs is None:
            return local.select(
                "term", "tf", F.lit(0).cast("long").alias("df"), "positions"
            ).orderBy("term")
        return (
            local.join(F.broadcast(dfs), "term", "left")
            .select("term", "tf", F.coalesce("df", F.lit(0)).cast("long").alias("df"), "positions")
            .orderBy("term")
        )

    def candidate_df_estimate(self, terms: list[str]) -> int:
        """Upper bound on the candidate-set size of an OR over `terms`:
        sum of n_docs over the pruned block METADATA rows — one tiny
        aggregation over bucket-pruned, `term IN`-pushed block rows; no
        posting bytes decoded. Over-counts (a doc holding several of the
        terms counts once per term; tombstoned docs count until
        compaction), which is the safe direction for a skip-the-prefilter
        selectivity gate (VERDICT r4 #2): an over-estimate can only make
        the planner fall back to the full scan it would otherwise beat."""
        if not terms:
            return 0
        dirs = self._bucket_dirs(terms)
        if not dirs:
            return 0
        row = (
            self._read_parquet(dirs, "blocks")
            .filter(F.col("term").isin(terms))
            .agg(F.sum("n_docs").alias("nd"))
            .collect()[0]
        )
        return int(row["nd"] or 0)

    def candidate_doc_ids(self, terms: list[str]) -> DataFrame:
        """DISTINCT LIVE doc_ids whose postings hold ANY of `terms`,
        straight off the pruned blocks: bucket-dir pruning + pushed
        `term IN`, and ONLY the doc_ids_varint column decoded (Catalyst
        prunes tf/dl/positions from the parquet scan). This is the index
        side of the accelerated-grep semi-join AND the exact match set
        behind count/facets/aggs/sorted search.

        Tombstone-exact: with overwrites present, each decoded id carries
        its segment (bid from the file path) and dead (bid, doc_id)
        pairs are anti-joined away — a doc whose OLD version matched but
        whose live version does not is NOT a candidate (its own build's
        postings never held the term), matching every scoring path's
        dead-masking. Single-build stores skip all of it (no extra
        column, no join)."""
        empty = self.spark.range(0).select(F.col("id").alias("doc_id"))
        if not terms:
            return empty
        dirs = self._bucket_dirs(terms)
        if not dirs:
            return empty
        blocks = self._read_parquet(dirs, "blocks").filter(F.col("term").isin(terms))
        tomb = self._tombstones_df()
        if tomb is None:
            blocks = blocks.select("doc_ids_varint")

            def ids_kernel(batches):
                import pyarrow as pa

                for rb in batches:
                    parts = [delta_decode_ids(v.as_py()) for v in rb.column(0)]
                    if parts:
                        u = np.unique(np.concatenate(parts))
                        yield pa.record_batch([pa.array(u, type=pa.int64())], ["doc_id"])

            return blocks.mapInArrow(ids_kernel, "doc_id long").distinct()

        from ..sources.segments import BID_PATTERN

        blocks = blocks.select(
            F.regexp_extract(F.col("_metadata.file_path"), BID_PATTERN, 1).alias("bid"),
            "doc_ids_varint",
        )

        def ids_bid_kernel(batches):
            import pyarrow as pa

            for rb in batches:
                bids, ids = [], []
                for b, v in zip(rb.column(0), rb.column(1)):
                    d = delta_decode_ids(v.as_py())
                    ids.append(d)
                    bids.extend([b.as_py()] * len(d))
                if ids:
                    yield pa.record_batch(
                        [
                            pa.array(bids, pa.string()),
                            pa.array(np.concatenate(ids), pa.int64()),
                        ],
                        ["bid", "doc_id"],
                    )

        cands = blocks.mapInArrow(ids_bid_kernel, "bid string, doc_id long")
        return (
            cands.join(
                tomb.select(F.col("dead_build").alias("bid"), "doc_id"),
                ["bid", "doc_id"],
                "left_anti",
            )
            .select("doc_id")
            .distinct()
        )

    def sorted_topk(
        self,
        query: str,
        sort_col: str = "path",
        asc: bool = True,
        k: int = 10,
        after: tuple | None = None,
        flt=None,
    ) -> DataFrame:
        """ES sort-by-field search (`sort: [{field: asc}]` +
        `search_after` on the field sort key): the k matching docs
        ordered by a docmap attribute instead of relevance.

        Plan shape: candidate ids off the pruned posting blocks (only
        doc_ids_varint decodes), id-only semi-join to the docmap, then
        orderBy+limit — Catalyst compiles it to TakeOrderedAndProject,
        so only k rows per partition survive the exchange; there is no
        full sort at any scale. The `after=(sort_value, doc_id)` cursor
        becomes a pushed row-filter (strictly after in (sort_col
        asc|desc, doc_id asc) order), so page N reads the same plan as
        page 1. `flt` optionally adds a non-scoring docmap predicate
        (filter context), pushed into the same scan."""
        terms = sorted(set(tokenize_py(query)))
        out_cols = ["doc_id", "repo", "path", "lang", "doc_len"]
        # filter context applies on the FULL docmap (a flt may reference
        # columns like `commit` that the projected result drops), exactly
        # as filtered_topk does; the narrowing select comes after.
        dm = self.docmap()
        if flt is not None:
            dm = dm.filter(flt)
        dm = dm.select(*out_cols)
        if sort_col not in dm.columns:
            raise ValueError(f"unsortable column {sort_col!r}")
        if not terms:
            return self.spark.createDataFrame([], dm.schema)
        dm = dm.join(self.candidate_doc_ids(terms), "doc_id", "left_semi")
        if after is not None:
            a_v, a_d = after
            nxt = F.col(sort_col) > a_v if asc else F.col(sort_col) < a_v
            dm = dm.filter(nxt | ((F.col(sort_col) == a_v) & (F.col("doc_id") > a_d)))
        key = F.asc(sort_col) if asc else F.desc(sort_col)
        return dm.orderBy(key, F.asc("doc_id")).limit(k)

    def match_aggs(
        self,
        query: str,
        ranges: list[tuple[str, int | None, int | None]] | None = None,
        interval: int = 25,
    ) -> DataFrame:
        """ES aggregation suite over an OR-match (range + histogram +
        stats + cardinality, the non-terms half of the aggs surface;
        terms aggs = facets()). Returns (agg, bucket, n_docs, metric)
        rows. Index path: candidate ids straight off the pruned posting
        blocks (only doc_ids_varint decodes), one id-only semi-join to
        the docmap's (lang, doc_len) — content is never read, and each
        agg is a Catalyst partial-aggregation (map-side combine) over the
        SAME cached candidate frame. Cardinality is exact countDistinct
        here; at 100-TB fan-in swap approx_count_distinct (HLL — exactly
        ES's cardinality agg semantics)."""
        ranges = ranges or [("short", None, 40), ("medium", 40, 80), ("long", 80, None)]
        out_schema = "agg string, bucket string, n_docs long, metric double"
        terms = sorted(set(tokenize_py(query)))
        if not terms:
            return self.spark.createDataFrame([], out_schema)
        bucket = None
        for name, lo_b, hi_b in ranges:
            cond = F.lit(True)
            if lo_b is not None:
                cond = cond & (F.col("doc_len") >= lo_b)
            if hi_b is not None:
                cond = cond & (F.col("doc_len") < hi_b)
            bucket = F.when(cond, name) if bucket is None else bucket.when(cond, name)
        dm = (
            self.docmap()
            .select("doc_id", "lang", "doc_len")
            .join(self.candidate_doc_ids(terms), "doc_id", "left_semi")
            .select(
                "lang",
                "doc_len",
                bucket.alias("rb"),
                (F.floor(F.col("doc_len") / interval) * interval)
                .cast("long")
                .cast("string")
                .alias("hb"),
            )
        )
        # ONE shuffle for all four aggs: GROUPING SETS ((rb), (hb), ())
        # over the single candidate pass — the candidate decode + semi-join
        # never re-runs per agg. grouping_id bits (rb,hb): 1 = range
        # buckets, 2 = histogram buckets, 3 = the global stats row.
        a = (
            dm.groupingSets([["rb"], ["hb"], []], "rb", "hb")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.min("doc_len").cast("double").alias("mn"),
                F.max("doc_len").cast("double").alias("mx"),
                F.sum("doc_len").cast("double").alias("sm"),
                F.round(F.avg("doc_len"), 4).alias("av"),
                F.countDistinct("lang").cast("double").alias("card"),
                F.grouping_id().alias("gid"),
            )
        )
        null_m = F.lit(None).cast("double")
        rng = a.filter(F.col("gid") == 1).select(
            F.lit("range").alias("agg"), F.col("rb").alias("bucket"), "n_docs", null_m.alias("metric")
        )
        hist = a.filter(F.col("gid") == 2).select(
            F.lit("histogram").alias("agg"), F.col("hb").alias("bucket"), "n_docs", null_m.alias("metric")
        )
        g = a.filter(F.col("gid") == 3)
        stats = None
        for b, c in [("min", "mn"), ("max", "mx"), ("sum", "sm"), ("avg", "av")]:
            row = g.select(
                F.lit("stats").alias("agg"), F.lit(b).alias("bucket"), "n_docs", F.col(c).alias("metric")
            )
            stats = row if stats is None else stats.unionByName(row)
        card = g.select(
            F.lit("cardinality").alias("agg"), F.lit("lang").alias("bucket"), "n_docs", F.col("card").alias("metric")
        )
        return (
            rng.unionByName(hist)
            .unionByName(stats)
            .unionByName(card)
            .orderBy("agg", "bucket")
        )

    def significant_terms(
        self,
        docs: DataFrame,
        query: str,
        size: int = 10,
        min_doc_count: int = 3,
    ) -> DataFrame:
        """ES `significant_terms` aggregation with the default JLH
        heuristic (the "what is unusual about the matching docs" half of
        the delegated aggs surface; /root/reference/elastic/elastic.go
        search passthrough): foreground = docs OR-matching the query,
        background = the whole corpus; a term is significant when its
        foreground rate beats its background rate, scored
        (fg% - bg%) * (fg% / bg%) — ES's JLH, rewarding both absolute
        lift and rarity. Query terms themselves are not excluded
        (ES semantics: they usually rank top).

        Index path, cost ∝ |foreground|, never the corpus: candidate ids
        come straight off the pruned posting blocks (only doc_ids_varint
        decodes), ONLY foreground docs' content is re-analyzed (id-only
        left-semi prunes the content scan), the per-term foreground df is
        a map-side partial agg over exploded distinct tokens, and the
        background df is the index's terms METADATA tables — no second
        corpus pass, no postings decode beyond the query's own blocks.
        The (fg vocab x terms-table) equi-join shuffles vocabulary-sized
        data only."""
        from ..analyze import tokenize_expr

        terms = sorted(set(tokenize_py(query)))
        out_schema = "term string, fg_df long, bg_df long, score_r double"
        if not terms:
            return self.spark.createDataFrame([], out_schema)
        # checkpointed so the id decode runs once for the scalar count
        # and the semi-join (an O(candidates) id-only frame)
        fg_ids = self.candidate_doc_ids(terms).localCheckpoint(eager=True)
        fg_n = fg_ids.count()
        if fg_n == 0:
            return self.spark.createDataFrame([], out_schema)
        fg_stats = (
            docs.join(fg_ids, "doc_id", "left_semi")
            .select(F.explode(F.array_distinct(tokenize_expr("content"))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("fg_df"))
        )
        dfreq = (
            self._read_parquet(self._terms_dirs(), "terms")
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("bg_df"))
        )
        fg_pct = F.col("fg_df") / F.lit(float(fg_n))
        bg_pct = F.col("bg_df") / F.lit(float(self.stats["N"]))
        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
        return (
            fg_stats.join(dfreq, "term")
            .filter((F.col("fg_df") >= min_doc_count) & (fg_pct > bg_pct))
            .select("term", "fg_df", "bg_df", F.round(score, 6).alias("score_r"))
            .orderBy(F.desc("score_r"), F.asc("term"))
            .limit(size)
        )

    def prefix_topk(self, prefix: str, k: int = 10, **kw) -> DataFrame:
        """Top-k BM25 for a prefix query: OR over the expanded terms (each
        expanded term scores with its own df/idf — standard query
        expansion, vs ES's ngram-as-a-term which needs an ngram postings
        index ~7x the size)."""
        return self._topk_terms(self.expand_prefix(prefix), k, **kw)

    def topk(
        self,
        query: str,
        k: int = 10,
        range_size: int = RANGE_SIZE_DEFAULT,
        with_docmap: bool = False,
        after: tuple[float, int] | None = None,
        flt=None,
    ) -> DataFrame:
        """`after=(score, doc_id)` is the ES search_after cursor: return
        the k docs strictly after the cursor in (score desc, doc_id asc)
        order — deep pagination without a from+size over-fetch. The cursor
        cut runs inside the kernel, so every page is a normal pruned
        top-k job, not a k*page scan. `flt` = ES filter context (same
        contract as filtered_topk)."""
        return self._topk_terms(
            sorted(set(tokenize_py(query))),
            k,
            flt=flt,
            range_size=range_size,
            with_docmap=with_docmap,
            after=after,
        )

    def filtered_topk(
        self,
        query: str,
        flt,
        k: int = 10,
        range_size: int = RANGE_SIZE_DEFAULT,
        with_docmap: bool = False,
        after: tuple[float, int] | None = None,
    ) -> DataFrame:
        """ES bool-query filter context (match `query` + `filter` over doc
        attributes, the delegated search surface's filtered form): top-k
        BM25 restricted to docs whose docmap row passes `flt` (a Catalyst
        predicate over docmap columns — repo/path/commit/lang/doc_len).

        Scale shape: the predicate pushes down into the docmap parquet
        scan; only the SURVIVING doc ids enter the query, as allow-list
        pseudo-rows riding the SAME rid shuffle as the posting blocks
        (the tombstone pattern — never a driver-held set). Inside the
        kernel the allow set masks candidates before scoring, strides
        holding no allowed doc are never visited, and block-max pruning
        stays sound: the threshold only ever reflects filtered survivors,
        and stride bounds remain valid upper bounds for any subset.
        docmap() is tombstone-masked, so an overwritten doc's live version
        filters on its CURRENT attributes; dead versions are additionally
        masked per-build as in every decode path.

        (r6: the allow-list plumbing moved into _topk_terms/_with_filter
        so every expansion path — topk, prefix, fuzzy, phrase, near,
        phrase_prefix — shares it; this method is the stable named API.)"""
        return self._topk_terms(
            sorted(set(tokenize_py(query))),
            k,
            flt=flt,
            range_size=range_size,
            with_docmap=with_docmap,
            after=after,
        )

    def bool_topk(
        self,
        must: str = "",
        should: str = "",
        must_not: str = "",
        flt=None,
        msm: int = 0,
        k: int = 10,
        range_size: int = RANGE_SIZE_DEFAULT,
        with_docmap: bool = False,
        after: tuple[float, int] | None = None,
    ) -> DataFrame:
        """The full ES bool query (the delegated search surface's composed
        form; /root/reference/elastic/elastic.go search passthrough):
        docs must contain every `must` token, >= `msm` distinct `should`
        tokens, no `must_not` token, and (optionally) pass the `flt`
        docmap predicate (non-scoring filter context). Score = BM25 over
        must+should occurrences, global corpus stats — ES semantics
        throughout.

        Plan shape: ONE pruned-bucket block read covering all three
        clauses' terms, one rid shuffle (filter ids ride it as pseudo-rows
        when flt is set), one Arrow kernel pass. The kernel adds a
        conjunctive stride rule — strides missing any must term's blocks
        are never visited — so selective conjunctions decode a small
        fraction of blocks (test_bool_kernel_conjunctive_prune)."""
        m_terms = sorted(set(tokenize_py(must)))
        s_terms = sorted(set(tokenize_py(should)))
        n_terms = sorted(set(tokenize_py(must_not)))
        overlap = (set(m_terms) & set(s_terms)) | (set(m_terms) | set(s_terms)) & set(n_terms)
        if overlap:
            raise ValueError(f"bool clauses must be disjoint, got {sorted(overlap)} twice")
        empty = self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        if not (m_terms or s_terms):
            return empty
        blocks = self._blocks_for_terms(sorted(set(m_terms + s_terms + n_terms)))
        if blocks is None:
            return empty
        n_docs = self.stats["N"]
        avgdl = self.stats["avgdl"]
        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = self._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)
        if flt is not None:
            ranged = ranged.withColumn("is_filt", F.lit(False)).unionByName(
                self.docmap()
                .filter(flt)
                .select(
                    F.col("doc_id").alias("first_doc_id"),
                    (F.col("doc_id") / range_size).cast("long").alias("rid"),
                    F.lit(False).alias("is_tomb"),
                    F.lit(True).alias("is_filt"),
                ),
                allowMissingColumns=True,
            )

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return bool_kernel(
                pdf, n_docs, avgdl, k, range_size, m_terms, s_terms, n_terms, msm,
                after=after,
            )

        local = ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)
        out = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_docmap:
            out = out.join(self.docmap().select("doc_id", "repo", "path"), "doc_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        return out

    def phrase_topk(
        self,
        phrase: str,
        k: int = 10,
        range_size: int = RANGE_SIZE_DEFAULT,
        with_docmap: bool = False,
        flt=None,
    ) -> DataFrame:
        """Exact-phrase top-k: docs whose analyzed token stream contains
        the query's tokens CONSECUTIVELY, ranked by the summed BM25 of the
        phrase's distinct terms (the match_phrase semantics of the
        delegated ES surface). Requires an index built with positions
        (build_index(..., with_positions=True), the default).

        A one-token phrase degenerates to a plain match query."""
        terms = list(tokenize_py(phrase))
        empty = self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        if not terms:
            return empty
        if len(terms) == 1:
            return self._topk_terms(
                terms, k, range_size=range_size, with_docmap=with_docmap, flt=flt
            )
        if not all(st.get("positions") for st in self.build_stats):
            raise ValueError(
                "phrase query requires every live segment built with_positions=True"
            )
        blocks = self._blocks_for_terms(sorted(set(terms)), with_positions=True)
        if blocks is None:
            return empty
        n_docs = self.stats["N"]
        avgdl = self.stats["avgdl"]
        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = self._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)

        ranged = self._with_filter(ranged, flt, range_size)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return phrase_kernel(pdf, terms, n_docs, avgdl, k, range_size)

        local = ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)
        out = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_docmap:
            out = out.join(self.docmap().select("doc_id", "repo", "path"), "doc_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        return out

    def phrase_prefix_topk(
        self,
        phrase: str,
        k: int = 10,
        max_expansions: int = 50,
        range_size: int = RANGE_SIZE_DEFAULT,
        with_docmap: bool = False,
        flt=None,
    ) -> DataFrame:
        """ES match_phrase_prefix (query-as-you-type over the delegated
        search surface): the LAST analyzed token is a prefix; it expands
        to the top-`max_expansions` vocabulary completions ranked by df
        (suggest_terms — ES caps expansions identically, picking
        index-order terms; df-ranked is this engine's documented prefix
        convention, the same as prefix_topk), and a doc matches when the
        fixed tokens are followed by ANY completion. Rank = distinct
        fixed terms' BM25 sum + the best matched completion's BM25.

        Plan: ONE TakeOrdered vocabulary job for the expansions, then the
        standard positional shape — pruned blocks for fixed + expansion
        terms, rid shuffle, two-pass decode (ids first; positions only
        where the fixed intersection AND the expansion union survive)."""
        terms = list(tokenize_py(phrase))
        empty = self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        if not terms:
            return empty
        if not all(st.get("positions") for st in self.build_stats):
            raise ValueError(
                "phrase_prefix query requires every live segment built "
                "with_positions=True"
            )
        fixed, last = terms[:-1], terms[-1]
        exp = [r["term"] for r in self.suggest_terms(last, size=max_expansions).collect()]
        if not exp:
            return empty
        blocks = self._blocks_for_terms(
            sorted(set(fixed) | set(exp)), with_positions=True
        )
        if blocks is None:
            return empty
        n_docs = self.stats["N"]
        avgdl = self.stats["avgdl"]
        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = self._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)

        ranged = self._with_filter(ranged, flt, range_size)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return phrase_prefix_kernel(pdf, fixed, exp, n_docs, avgdl, k, range_size)

        local = ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)
        out = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_docmap:
            out = out.join(self.docmap().select("doc_id", "repo", "path"), "doc_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        return out

    def near_topk(
        self,
        query: str,
        window: int = 8,
        k: int = 10,
        range_size: int = RANGE_SIZE_DEFAULT,
        with_docmap: bool = False,
        flt=None,
    ) -> DataFrame:
        """Proximity top-k: docs containing ALL query terms within a
        `window` of consecutive analyzed-token positions, in any order,
        ranked by summed distinct-term BM25 (the unordered counterpart of
        phrase_topk; window == len(terms) makes it an unordered phrase).
        Requires positions (the index default)."""
        terms = sorted(set(tokenize_py(query)))
        empty = self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        if not terms:
            return empty
        if len(terms) == 1:
            return self._topk_terms(
                terms, k, range_size=range_size, with_docmap=with_docmap, flt=flt
            )
        if not all(st.get("positions") for st in self.build_stats):
            raise ValueError(
                "proximity query requires every live segment built with_positions=True"
            )
        blocks = self._blocks_for_terms(terms, with_positions=True)
        if blocks is None:
            return empty
        n_docs = self.stats["N"]
        avgdl = self.stats["avgdl"]
        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = self._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)

        ranged = self._with_filter(ranged, flt, range_size)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return near_kernel(pdf, terms, window, n_docs, avgdl, k, range_size)

        local = ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)
        out = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_docmap:
            out = out.join(self.docmap().select("doc_id", "repo", "path"), "doc_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        return out

    def topk_many(
        self,
        queries: list[tuple[int, str, int]],
        range_size: int = RANGE_SIZE_DEFAULT,
    ) -> DataFrame:
        """Batch scoring: the WHOLE query set in one Spark job.

        -> (query_id, rank, doc_id, score). Blocks for the union of all
        query terms are fetched AND shuffled once — a block shared by many
        queries is not replicated (VERDICT r2 #2); the query->terms map is
        per-batch metadata carried in the kernel closure, and each rid's
        kernel decodes every term once then aggregates per query in memory
        (multiquery_kernel). Per-query global top-k via a rank window.
        Per-query Spark-job overhead (the dominant cost of single-query
        latency at small scale) amortizes across the set — this is the
        shape a production batch scorer uses.
        """
        import pandas as pd  # noqa: F811

        per_q = {qid: sorted(set(tokenize_py(q))) for qid, q, k in queries}
        k_by_q = {qid: k for qid, _, k in queries}
        all_terms = sorted({t for ts in per_q.values() for t in ts})
        empty = self.spark.createDataFrame(
            [], "query_id long, rank int, doc_id long, score double"
        )
        if not all_terms:
            return empty
        blocks = self._blocks_for_terms(all_terms)
        if blocks is None:
            return empty
        n_docs = self.stats["N"]
        avgdl = self.stats["avgdl"]

        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = self._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return multiquery_kernel(pdf, per_q, k_by_q, n_docs, avgdl, range_size)

        local = ranged.groupBy("rid").applyInPandas(
            kernel, "query_id long, doc_id long, score double"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        ranked = local.withColumn("rank", F.row_number().over(w))
        cond = None
        for qid, k in k_by_q.items():
            c = (F.col("query_id") == qid) & (F.col("rank") <= k)
            cond = c if cond is None else (cond | c)
        return ranked.filter(cond).select("query_id", "rank", "doc_id", "score")

    def scores(self, terms: list[str], range_size: int = RANGE_SIZE_DEFAULT) -> DataFrame:
        """ALL docs matching >= 1 term, with their full BM25 scores —
        exhaustive disjunctive mode (no top-k pruning), the building block
        for cross-field composition where the global cut can only happen
        AFTER field scores merge. Same kernel as topk with k = range_size:
        a range holds at most range_size docs, so nothing is cut."""
        empty = self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        if not terms:
            return empty
        blocks = self._blocks_for_terms(terms)
        if blocks is None:
            return empty
        n_docs = self.stats["N"]
        avgdl = self.stats["avgdl"]
        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = self._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return wand_kernel(pdf, n_docs, avgdl, range_size, range_size)

        return ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)

    def _filter_rows(self, flt, range_size: int) -> DataFrame:
        """ES bool-filter allow-list as pseudo-rows riding the SAME rid
        shuffle as the posting blocks (the tombstone pattern — never a
        driver-held set): the docmap predicate pushes into the parquet
        scan and only SURVIVING doc ids travel."""
        return (
            self.docmap()
            .filter(flt)
            .select(
                F.col("doc_id").alias("first_doc_id"),
                (F.col("doc_id") / range_size).cast("long").alias("rid"),
                F.lit(False).alias("is_tomb"),
                F.lit(True).alias("is_filt"),
            )
        )

    def _with_filter(self, ranged: DataFrame, flt, range_size: int) -> DataFrame:
        if flt is None:
            return ranged
        return ranged.withColumn("is_filt", F.lit(False)).unionByName(
            self._filter_rows(flt, range_size), allowMissingColumns=True
        )

    def _topk_terms(
        self,
        terms: list[str],
        k: int = 10,
        range_size: int = RANGE_SIZE_DEFAULT,
        with_docmap: bool = False,
        after: tuple[float, int] | None = None,
        flt=None,
    ) -> DataFrame:
        empty = self.spark.createDataFrame([], WAND_OUT_SCHEMA)
        if not terms:
            return empty
        blocks = self._blocks_for_terms(terms)
        if blocks is None:
            return empty
        n_docs = self.stats["N"]
        avgdl = self.stats["avgdl"]

        # A block overlapping multiple ranges is replicated to each; the
        # kernel masks decoded ids to its own range, so no double counting.
        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = self._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)
        ranged = self._with_filter(ranged, flt, range_size)

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            return wand_kernel(pdf, n_docs, avgdl, k, range_size, after=after)

        local = ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)
        out = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_docmap:
            out = out.join(self.docmap().select("doc_id", "repo", "path"), "doc_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        return out


def multifield_kernel(
    pdf: pd.DataFrame,
    metas: dict[int, tuple[int, float, float]],
    k: int,
    range_size: int,
    stride: int = STRIDE,
    prune_stats: dict | None = None,
) -> pd.DataFrame:
    """Blocks of ALL fields' query terms for ONE doc_id range -> combined
    BM25F local top-k (VERDICT r4 #1 — the pruned replacement for the
    exhaustive per-field scores() union).

    metas: field index -> (n_docs, avgdl, boost) — every field keeps its
    OWN statistics (the Lucene per-field model). The stride upper bound is
    the sum over (field, term) pairs of boost_f x idf_{f,t} x the pair's
    block-max tfnorm — a valid bound on the combined score because a doc
    scores each field independently — so the existing _bmw_range_topk
    loop prunes soundly over the combined bound with (field|term) as the
    accumulation key. Survivor blocks decode lazily with their field's
    avgdl and boost applied at score time; docs never double-count
    because doc_id ranges align across fields (one shared doc_id space).
    """
    empty = pd.DataFrame({"doc_id": [], "score": []}).astype(
        {"doc_id": "int64", "score": "float64"}
    )
    rid = int(pdf["rid"].iloc[0])
    dead: dict = {}
    if "is_tomb" in pdf.columns:
        tm = pdf["is_tomb"].to_numpy()
        if tm.any():
            trows = pdf[tm]
            dead = {
                (int(f), b): g["first_doc_id"].to_numpy().astype(np.int64)
                for (f, b), g in trows.groupby(["field", "bid"])
            }
            pdf = pdf[~tm].reset_index(drop=True)
    if pdf.empty:
        return empty
    row_bid = pdf["bid"].to_numpy() if "bid" in pdf.columns else None
    row_field = pdf["field"].to_numpy().astype(np.int64)
    row_term = pdf["term"].to_numpy()
    # idf per (field, term): df is field-local (window-summed over that
    # field's pruned blocks), N is the field's corpus size
    ft = pdf[["field", "term", "df"]].drop_duplicates(["field", "term"])
    # df clamped to the field's N — same deleted-docs-drift guard as
    # _idf_map (a negative idf would zero the combined BM25F bound)
    idf_by_ft = {
        (int(f), t): float(
            np.log(
                1.0
                + (metas[int(f)][0] - min(int(d), metas[int(f)][0]) + 0.5)
                / (min(int(d), metas[int(f)][0]) + 0.5)
            )
        )
        for f, t, d in zip(ft["field"], ft["term"], ft["df"])
    }
    lo, hi = rid * range_size, (rid + 1) * range_size
    fd = pdf["first_doc_id"].to_numpy()
    ld = pdf["last_doc_id"].to_numpy()
    scale = pdf["scale"].to_numpy() if "scale" in pdf.columns else 1.0
    idfs = np.asarray(
        [idf_by_ft[(int(f), t)] for f, t in zip(row_field, row_term)],
        dtype=np.float64,
    )
    boosts = np.asarray([metas[int(f)][2] for f in row_field], dtype=np.float64)
    bms = pdf["block_max_tfnorm"].to_numpy() * idfs * scale * boosts
    # composite accumulation key: the same term in two fields contributes
    # twice to a doc's combined score, so the UB must sum per (field,term)
    comp = np.char.add(
        np.char.add(row_field.astype("U20"), "|"), row_term.astype("U")
    )

    decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def decode(i: int) -> tuple[np.ndarray, np.ndarray]:
        if i not in decoded:
            f = int(row_field[i])
            _, avgdl_f, boost_f = metas[f]
            ids = delta_decode_ids(pdf["doc_ids_varint"].iloc[i])
            tfs = varint_decode(pdf["tfs_varint"].iloc[i]).astype(np.float64)
            dls = varint_decode(pdf["dls_varint"].iloc[i]).astype(np.float64)
            sc = _score_block(tfs, dls, idfs[i], avgdl_f) * boost_f
            m = (ids >= lo) & (ids < hi)
            if dead and row_bid is not None:
                dd = dead.get((f, row_bid[i]))
                if dd is not None and dd.size:
                    m &= ~np.isin(ids, dd)
            decoded[i] = (ids[m], sc[m])
        return decoded[i]

    d_out, s_out = _bmw_range_topk(
        np.arange(len(pdf)), comp, fd, ld, bms, decode, k, lo, range_size, stride
    )
    if prune_stats is not None:
        prune_stats["n_blocks_total"] = len(pdf)
        prune_stats["n_blocks_decoded"] = len(decoded)
    return pd.DataFrame({"doc_id": d_out, "score": s_out}).astype(
        {"doc_id": "int64", "score": "float64"}
    )


def multifield_topk(
    fields: list[tuple["IndexReader", float]],
    query: str,
    k: int = 10,
    range_size: int = RANGE_SIZE_DEFAULT,
    pruned: bool = True,
    stride: int = STRIDE,
) -> DataFrame:
    """E8 multi-field search THROUGH the index: one physical index per
    field (the Lucene per-field inverted-index model — each field has its
    own df/dl/avgdl statistics), score = sum over fields of
    boost_f * BM25_f(doc).

    pruned=True (VERDICT r4 #1): ONE combined BM25F-style WAND — every
    field's blocks are fetched tagged by field, ranged into the SHARED
    doc_id partitioning, and multifield_kernel prunes strides against the
    summed per-(field,term) block-max bound, decoding only survivor
    blocks. pruned=False keeps the former exhaustive shape (per-field
    scores() with k = range_size, boost-weighted union, global cut) — the
    reference both paths must match; the exhaustive cut is still correct
    because a doc's combined rank isn't knowable from any single field's
    top-k, but it decodes every posting of every term in every field."""
    terms = sorted(set(tokenize_py(query)))
    if not fields:
        raise ValueError("no fields")
    if not pruned:
        parts = []
        for reader, boost in fields:
            s = reader.scores(terms, range_size=range_size)
            parts.append(s.withColumn("score", F.col("score") * F.lit(float(boost))))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return (
            out.groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    spark = fields[0][0].spark
    metas: dict[int, tuple[int, float, float]] = {}
    # Fields bound to the SAME physical store (same out_dir + live builds —
    # e.g. one index queried under several boosts) share ONE block scan:
    # the pruned parquet read, the df window and the tomb union are
    # identical per store, so replicate the rows with an exploded field-tag
    # array instead of unioning N identical subtrees (N-1 fewer scans; the
    # kernel sees exactly the rows the per-field unions produced).
    groups: dict[tuple, tuple] = {}
    order: list[tuple] = []
    for fi, (reader, boost) in enumerate(fields):
        metas[fi] = (reader.stats["N"], reader.stats["avgdl"], float(boost))
        key = (reader.out_dir, tuple(reader.build_ids))
        if key not in groups:
            groups[key] = (reader, [])
            order.append(key)
        groups[key][1].append(fi)
    parts = []
    for key in order:
        reader, fis = groups[key]
        blocks = reader._blocks_for_terms(terms)
        if blocks is None:
            continue
        rid = F.explode(
            F.sequence(
                (F.col("first_doc_id") / range_size).cast("long"),
                (F.col("last_doc_id") / range_size).cast("long"),
            )
        ).alias("rid")
        ranged = blocks.select("*", rid).withColumn("is_tomb", F.lit(False))
        tomb = reader._tomb_ranged(range_size)
        if tomb is not None:
            ranged = ranged.unionByName(tomb, allowMissingColumns=True)
        parts.append(
            ranged.withColumn(
                "field", F.explode(F.array(*[F.lit(fi) for fi in fis]))
            )
        )
    if not parts:
        return spark.createDataFrame([], WAND_OUT_SCHEMA)
    ranged = parts[0]
    for p in parts[1:]:
        ranged = ranged.unionByName(p, allowMissingColumns=True)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return multifield_kernel(pdf, metas, k, range_size, stride)

    local = ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def multifield_topk_single(
    reader: "IndexReader",
    fields: list[tuple[str, float]],
    query: str,
    k: int = 10,
    range_size: int = RANGE_SIZE_DEFAULT,
    stride: int = STRIDE,
) -> DataFrame:
    """BM25F over a SINGLE multifield store (build_multifield_index) —
    rank/score-identical to multifield_topk over one store per field, but
    the build paid ONE corpus pass and ONE shuffle for all fields, and the
    query is ONE pruned block fetch (bucket dirs pruned once for the union
    of all fields' terms) instead of one per field.

    fields: [(field_name, boost)] — names from the build's `fields`; the
    primary field's terms are stored bare, secondary fields' prefixed
    "<field>:<term>". Statistics (N, avgdl, df, block-max bounds) are all
    per-field by construction, so multifield_kernel's combined-bound
    pruning applies unchanged: the blocks are simply tagged with their
    field index derived from the stored term's prefix.

    Deletion interplay is deliberately out of scope for now: per-field
    statistics do not track tombstones, so a store with pending deletes
    must compact first (compact() recomputes exact per-field stats)."""
    fstats = reader.field_stats
    if fstats is None:
        raise ValueError(
            "not a multifield store (every live build needs stats.json "
            "'fields'; build with build_multifield_index)"
        )
    if reader.has_tombstones:
        raise NotImplementedError(
            "BM25F over a store with pending deletions — compact() first "
            "(per-field statistics do not track tombstones)"
        )
    prim = reader.primary_field
    names = [n for n, _ in fields]
    unknown = sorted(set(names) - set(fstats))
    if unknown:
        raise ValueError(f"unknown fields {unknown}; store has {sorted(fstats)}")
    spark = reader.spark
    empty = spark.createDataFrame([], WAND_OUT_SCHEMA)
    terms = sorted(set(tokenize_py(query)))
    if not terms or not fields:
        return empty
    sep = ":"  # segments.FIELD_SEP; analyzed tokens are alnum-only
    all_terms = sorted(
        {t if n == prim else f"{n}{sep}{t}" for n in names for t in terms}
    )
    blocks = reader._blocks_for_terms(all_terms)
    if blocks is None:
        return empty
    metas = {
        fi: (fstats[n]["N"], fstats[n]["avgdl"], float(boost))
        for fi, (n, boost) in enumerate(fields)
    }
    fname = F.when(
        F.col("term").contains(sep), F.substring_index("term", sep, 1)
    ).otherwise(F.lit(prim))
    fidx = F.lit(None).cast("int")
    for fi, n in enumerate(names):
        fidx = F.when(fname == n, F.lit(fi)).otherwise(fidx)
    bare = F.when(
        F.col("term").contains(sep),
        F.expr(f"substring(term, instr(term, '{sep}') + 1)"),
    ).otherwise(F.col("term"))
    rid = F.explode(
        F.sequence(
            (F.col("first_doc_id") / range_size).cast("long"),
            (F.col("last_doc_id") / range_size).cast("long"),
        )
    ).alias("rid")
    ranged = (
        blocks.select("*", rid)
        .withColumn("is_tomb", F.lit(False))
        .withColumn("field", fidx)
        .withColumn("term", bare)
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return multifield_kernel(pdf, metas, k, range_size, stride)

    local = ranged.groupBy("rid").applyInPandas(kernel, WAND_OUT_SCHEMA)
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


register_by_value(__name__)
