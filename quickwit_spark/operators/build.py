"""Index build: transcripts table → per-split posting files + catalog.

The Spark-first re-expression of the reference's indexing pipeline
(quickwit-indexing/src/actors/indexing_pipeline.rs:233-439):

* Source → Indexer routing (``RoutingExpr::eval_hash``,
  quickwit-doc-mapper/src/default_doc_mapper/routing_expression/mod.rs:132-151)
  becomes ``groupBy(crc32(conv_id) % n_splits)`` — ONE Spark shuffle, the
  same data movement the actor pipeline does with mailboxes.
* Indexer+Packager (tokenize, build in-RAM index, serialize one segment —
  quickwit-indexing/src/actors/indexer.rs:230-286, packager.rs:168-233)
  become a vectorized ``applyInPandas`` kernel per split group: numpy
  factorize/lexsort posting construction, delta+varint encoding in one
  pass (no per-row Python), written as Parquet from the worker.
* Uploader/Publisher staging (uploader.rs:240-271, publisher.rs:140-148)
  become ``Catalog.stage_split`` + atomic ``publish_splits`` with a
  checkpoint delta per routing partition — killing the driver between
  publishes and re-running resumes at split granularity (the build
  filters out already-published partitions).

Scale notes (100 TB / 10^12 turns):
* one split group ≈ ``split_num_docs_target`` docs (10M, reference
  default — quickwit-config/src/index_config.rs:180-182); choose
  ``n_splits ≈ total_docs / target`` so each applyInPandas group fits an
  executor (the reference sizes splits the same way).
* hot terms are salted *within* a split: posting lists longer than
  ``hot_term_doc_freq`` docs are sharded into rows of at most
  ``salt_docid_range`` docs, bounding row size and giving the query
  kernel shard-level block-max bounds (max_tf, min_dl per shard) for
  WAND skipping.
* the docs file is the doc store (row-oriented zstd in the reference —
  index_config.rs:172-178; columnar zstd Parquet here, strictly better
  for Spark's fetch-by-column access).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd

from quickwit_spark.config import IndexConfig
from quickwit_spark.functions.codec import grouped_delta_encode
from quickwit_spark.functions.tokenize import tokenize_encode
from quickwit_spark.plans.catalog import Catalog, SplitMetadata

POSTINGS_FILE = "postings.parquet"
DOCS_FILE = "docs.parquet"

# Publish batch size: each atomic catalog commit covers a chunk of
# splits + their checkpoint keys (the reference's PackagedSplitBatch →
# publish unit); a crash between chunks loses at most one chunk of work
# to the resume filter.
PUBLISH_CHUNK = 16

# internal columns added to the doc store next to the original row
# (the reference stores the raw doc under _source — default_mapper.rs:296-300;
# our doc store is the full original row plus fast-field extras)
INTERNAL_DOC_COLUMNS = ("docid", "ts_us", "doc_len")


def _field_posting_columns(
    lens: np.ndarray,
    codes: np.ndarray,
    uniq_terms: np.ndarray,
    doc_len: np.ndarray,
    field_name: str,
    with_positions: bool,
    hot_term_doc_freq: int,
    salt_docid_range: int,
) -> dict | None:
    """Vectorized posting construction for one field of one split.

    Input is the dictionary-encoded flat token stream from
    ``tokenize_encode`` (lens per doc, term codes in doc order, sorted
    term dictionary). lexsort → run-length boundaries, then ONE varint
    pass per component sliced at row boundaries (grouped_delta_encode).
    Returns parallel column lists for the postings Parquet, rows
    sorted by (term, shard).
    """
    n = lens.size
    total = int(codes.size)
    if total == 0:
        return None
    docids = np.repeat(np.arange(n, dtype=np.int64), lens)
    doc_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, lens)

    order = np.lexsort((pos, docids, codes))
    codes, docids, pos = codes[order], docids[order], pos[order]

    # (term, docid) pair boundaries — token-index space
    pair_mask = np.empty(total, dtype=bool)
    pair_mask[0] = True
    pair_mask[1:] = (codes[1:] != codes[:-1]) | (docids[1:] != docids[:-1])
    pair_tok_starts = np.flatnonzero(pair_mask)
    tf = np.diff(np.append(pair_tok_starts, total)).astype(np.int64)
    p_docid = docids[pair_tok_starts]
    p_code = codes[pair_tok_starts]
    p_dl = doc_len[p_docid]

    # term boundaries — pair-index space
    term_mask = np.empty(p_code.size, dtype=bool)
    term_mask[0] = True
    term_mask[1:] = p_code[1:] != p_code[:-1]
    term_starts = np.flatnonzero(term_mask)
    term_dfs = np.diff(np.append(term_starts, p_code.size))

    # posting rows = terms, with hot terms sharded into salt_docid_range
    # chunks (explicit skew handling — north rule)
    hot = np.flatnonzero(term_dfs > hot_term_doc_freq)
    if hot.size:
        extra = [
            term_starts[i]
            + np.arange(salt_docid_range, term_dfs[i], salt_docid_range)
            for i in hot
        ]
        row_starts = np.sort(np.concatenate([term_starts, *extra]))
    else:
        row_starts = term_starts
    n_rows = row_starts.size
    row_dfs = np.diff(np.append(row_starts, p_code.size)).astype(np.int64)
    row_code = p_code[row_starts]
    # shard ordinal within its term
    first_row_of_term = np.searchsorted(row_starts, term_starts)
    shard = np.arange(n_rows, dtype=np.int64) - np.repeat(
        first_row_of_term, np.diff(np.append(first_row_of_term, n_rows))
    )

    max_tf = np.maximum.reduceat(tf, row_starts)
    min_dl = np.minimum.reduceat(p_dl, row_starts)
    row_ends = np.append(row_starts[1:], p_code.size) - 1
    first_docid = p_docid[row_starts]
    last_docid = p_docid[row_ends]

    doc_id_blobs = grouped_delta_encode(p_docid, row_starts, delta=True)
    tf_blobs = grouped_delta_encode(tf, row_starts, delta=False)
    if with_positions:
        pos_blobs = grouped_delta_encode(
            pos,
            reset_starts=pair_tok_starts,
            slice_starts=pair_tok_starts[row_starts],
            delta=True,
        )
    else:
        pos_blobs = [None] * n_rows

    return {
        "field": [field_name] * n_rows,
        "term": uniq_terms[row_code].tolist(),
        "shard": shard,
        "df": row_dfs,
        "max_tf": max_tf.astype(np.int64),
        "min_dl": min_dl.astype(np.int64),
        "first_docid": first_docid.astype(np.int64),
        "last_docid": last_docid.astype(np.int64),
        "doc_ids": doc_id_blobs,
        "tfs": tf_blobs,
        "positions": pos_blobs,
        "_uniq_terms": uniq_terms,  # caller pops for term_range/tags
    }


def limit_worker_threads(n: int = 1) -> None:
    """Cap Arrow's per-process thread pools inside task workers — many
    concurrent kernels each defaulting to a cores-wide pool oversubscribe
    the machine (measured ~4x per-kernel slowdown at 32 workers)."""
    try:
        import pyarrow as pa

        if pa.cpu_count() > n:
            pa.set_cpu_count(n)
        if pa.io_thread_count() > 2:
            pa.set_io_thread_count(2)
    except Exception:
        pass


def build_split_tables(pdf: pd.DataFrame, config: IndexConfig):
    """Pure (no-Spark) split build: one routing partition's docs →
    (postings DataFrame, docs DataFrame, metadata dict).

    Docid assignment is the stable ``(conv_id, turn_idx)`` sort —
    SURVEY.md §7.2 tie-breaking: the reference's
    ``(split_id, segment_ord, doc_id)`` order (quickwit-search/src/lib.rs:100-105)
    is deterministic here because docids are a deterministic function of
    doc identity.
    """
    limit_worker_threads()
    pdf = pdf.sort_values(
        list(config.doc_key_fields), kind="mergesort"
    ).reset_index(drop=True)
    n = len(pdf)
    ts = pd.to_datetime(pdf[config.timestamp_field])
    ts_us = (ts.astype("int64") // 1000).to_numpy()

    field_tokens: dict[str, tuple] = {}
    for f in config.fields:
        field_tokens[f.name] = tokenize_encode(pdf[f.name], f.tokenizer)

    doc_len = field_tokens[config.default_search_field][0]

    posting_cols: dict[str, list] = {
        k: []
        for k in (
            "field", "term", "shard", "df", "max_tf", "min_dl",
            "first_docid", "last_docid", "doc_ids", "tfs", "positions",
        )
    }
    term_range = None
    tags: dict[str, list | None] = {}
    tag_has_null: dict[str, bool] = {}
    for f in config.fields:
        f_lens, f_codes, f_uniq = field_tokens[f.name]
        if f.name in config.tag_fields:
            # presence marker: some doc contributed NO tag token
            # (null / empty / dropped) — keeps must_not pruning sound
            tag_has_null[f.name] = bool((f_lens == 0).any())
        cols = _field_posting_columns(
            f_lens,
            f_codes,
            f_uniq,
            doc_len,
            f.name,
            f.with_positions,
            config.hot_term_doc_freq,
            config.salt_docid_range,
        )
        if cols is None:
            continue
        uniq = cols.pop("_uniq_terms")
        if f.name == config.default_search_field:
            term_range = (str(uniq[0]), str(uniq[-1]))
        if f.name in config.tag_fields:
            tags[f.name] = (
                sorted(map(str, uniq))
                if uniq.size <= config.max_tag_values
                else None  # overflow ⇒ uninformative (packager.rs:36-43)
            )
        for k, v in cols.items():
            posting_cols[k].extend(v if isinstance(v, list) else v.tolist())

    postings = pd.DataFrame(posting_cols)
    source_cols = [c for c in pdf.columns if c not in INTERNAL_DOC_COLUMNS]
    docs = pd.DataFrame(
        {
            "docid": np.arange(n, dtype=np.int64),
            **{c: pdf[c].to_numpy() for c in source_cols},
            "ts_us": ts_us,
            "doc_len": doc_len,
        }
    )
    meta = {
        "num_docs": int(n),
        "sum_doc_len": int(doc_len.sum()),
        "uncompressed_docs_size_in_bytes": int(
            pdf[config.default_search_field].str.len().fillna(0).sum()
        ),
        "time_range": (int(ts_us.min()), int(ts_us.max())) if n else None,
        "term_range": term_range,
        "tags": tags,
        "tag_has_null": tag_has_null,
    }
    return postings, docs, meta


def write_split(postings: pd.DataFrame, docs, split_dir: str) -> int:
    """Write a split's two Parquet files (zstd, like the reference's doc
    store — index_config.rs:172-178); returns total bytes. ``docs`` may
    be a pandas DataFrame or a pyarrow Table. ``split_dir`` may be any
    pyarrow-supported URI (functions/fs) — the storage-trait analog."""
    import pyarrow as pa

    from quickwit_spark.functions import fs as fsio

    fsio.makedirs(split_dir)
    ppath = fsio.join(split_dir, POSTINGS_FILE)
    dpath = fsio.join(split_dir, DOCS_FILE)
    fsio.write_table(
        pa.Table.from_pandas(postings, preserve_index=False),
        ppath,
        compression="zstd",
        # small row groups keep stats-pruned term point reads tight
        # (functions/parquet_io.read_pruned touches O(1) groups)
        row_group_size=2048,
    )
    if not isinstance(docs, pa.Table):
        docs = pa.Table.from_pandas(docs, preserve_index=False)
    # 8k-doc groups: fetch_docs decompresses ~8k rows per hit group
    # instead of 65k, at a still-tiny footer overhead
    fsio.write_table(docs, dpath, compression="zstd", row_group_size=8192)
    return fsio.getsize(ppath) + fsio.getsize(dpath)


def build_split_tables_arrow(tbl, config: IndexConfig):
    """Arrow-native variant of :func:`build_split_tables` — the
    ``applyInArrow`` kernel body. Keeps every string in C++ buffers
    (sort_by, tokenize, dictionary-encode, doc-store assembly) so 32
    concurrent kernels don't fight over Python object allocation;
    output is identical (tests assert byte parity of posting blobs).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    limit_worker_threads()
    tbl = tbl.sort_by([(k, "ascending") for k in config.doc_key_fields])
    n = len(tbl)
    ts_col = tbl.column(config.timestamp_field)
    if ts_col.type != pa.timestamp("us"):
        ts_col = pc.cast(ts_col, pa.timestamp("us"))
    ts_us = pc.cast(ts_col, pa.int64()).combine_chunks()

    field_tokens: dict[str, tuple] = {}
    for f in config.fields:
        field_tokens[f.name] = tokenize_encode(tbl.column(f.name), f.tokenizer)
    doc_len = field_tokens[config.default_search_field][0]

    posting_cols: dict[str, list] = {
        k: []
        for k in (
            "field", "term", "shard", "df", "max_tf", "min_dl",
            "first_docid", "last_docid", "doc_ids", "tfs", "positions",
        )
    }
    term_range = None
    tags: dict[str, list | None] = {}
    tag_has_null: dict[str, bool] = {}
    for f in config.fields:
        f_lens, f_codes, f_uniq = field_tokens[f.name]
        if f.name in config.tag_fields:
            tag_has_null[f.name] = bool((f_lens == 0).any())
        cols = _field_posting_columns(
            f_lens, f_codes, f_uniq, doc_len, f.name, f.with_positions,
            config.hot_term_doc_freq, config.salt_docid_range,
        )
        if cols is None:
            continue
        uniq = cols.pop("_uniq_terms")
        if f.name == config.default_search_field:
            term_range = (str(uniq[0]), str(uniq[-1]))
        if f.name in config.tag_fields:
            tags[f.name] = (
                sorted(map(str, uniq))
                if uniq.size <= config.max_tag_values
                else None
            )
        for k, v in cols.items():
            posting_cols[k].extend(v if isinstance(v, list) else v.tolist())
    postings = pd.DataFrame(posting_cols)

    docs = pa.table(
        {
            "docid": pa.array(np.arange(n, dtype=np.int64)),
            **{c: tbl.column(c) for c in tbl.column_names},
            "ts_us": ts_us,
            "doc_len": pa.array(doc_len),
        }
    )
    text_len = pc.sum(
        pc.fill_null(
            pc.utf8_length(tbl.column(config.default_search_field)), 0
        )
    ).as_py() or 0
    mm = pc.min_max(ts_us)
    meta = {
        "num_docs": int(n),
        "sum_doc_len": int(doc_len.sum()),
        "uncompressed_docs_size_in_bytes": int(text_len),
        "time_range": (
            (int(mm["min"].as_py()), int(mm["max"].as_py())) if n else None
        ),
        "term_range": term_range,
        "tags": tags,
        "tag_has_null": tag_has_null,
    }
    return postings, docs, meta


def split_id_for_partition(ingest_id: str, split_ord: int) -> str:
    return f"split-{ingest_id}-{split_ord:05d}"


def _migrate_legacy_checkpoint(catalog: Catalog) -> None:
    """Indexes written before per-ingest namespacing recorded bare
    ``"<partition>": "done"`` checkpoint keys. Fold them into the
    ``batch/b0000/<partition>`` namespace (no completion marker — the
    next resume re-derives it), so a resume on a pre-upgrade index
    keeps skipping its published partitions instead of silently
    rebuilding and double-publishing every document."""
    legacy = [k for k in catalog.checkpoint if k.isdigit()]
    if not legacy:
        return
    new = dict(catalog.checkpoint)
    for k in legacy:
        new[f"batch/b0000/{k}"] = new.pop(k)
    catalog.replace_checkpoint(new)


def _resolve_ingest_id(catalog: Catalog, source, ingest_id: str | None) -> str:
    """Pick the checkpoint namespace for this batch build.

    Each batch ingest gets its own checkpoint namespace
    (``batch/<ingest_id>/<partition>`` keys + a ``batch/<ingest_id>``
    completion marker) and its own split-id prefix, so a SECOND ingest
    with new data is never silently swallowed by the first ingest's
    'done' checkpoints (the reference's SourceCheckpoint is per-source
    for the same reason — checkpoint.rs:34-105).

    Defaults: a path source derives its id from the path (same path →
    resume/no-op, new path → append); a DataFrame source resumes the
    single incomplete namespace if one exists, starts ``b0000`` on a
    fresh index, and otherwise raises — the caller must say whether
    this is a retry (same ingest_id) or an append (new ingest_id).
    """
    if ingest_id is not None:
        if "/" in ingest_id:
            raise ValueError("ingest_id must not contain '/'")
        return ingest_id
    if isinstance(source, str):
        import hashlib

        path_ns = (
            "p" + hashlib.md5(os.path.abspath(source).encode()).hexdigest()[:10]
        )
        if any(
            k == f"batch/{path_ns}" or k.startswith(f"batch/{path_ns}/")
            for k in catalog.checkpoint
        ):
            return path_ns  # this path already has its own namespace
        # pre-namespacing indexes recorded bare '<partition>' checkpoint
        # keys that _migrate_legacy_checkpoint folds into 'b0000'; when
        # THIS index was created from the SAME source path and has a
        # b0000 namespace, that namespace IS the legacy build — resume
        # it (no-op once complete) instead of hashing the path into a
        # fresh empty namespace and double-publishing every document.
        sp = catalog.source_path
        if (
            sp is not None
            and os.path.abspath(sp) == os.path.abspath(source)
            and any(
                k == "batch/b0000" or k.startswith("batch/b0000/")
                for k in catalog.checkpoint
            )
        ):
            return "b0000"
        return path_ns
    namespaces = {
        k.split("/", 2)[1]
        for k in catalog.checkpoint
        if k.startswith("batch/")
    }
    complete = {
        ns for ns in namespaces if catalog.checkpoint.get(f"batch/{ns}") == "complete"
    }
    incomplete = sorted(namespaces - complete)
    if len(incomplete) == 1:
        return incomplete[0]  # crash-resume of the interrupted ingest
    if not namespaces:
        return "b0000"
    raise ValueError(
        "this index already has completed batch ingests "
        f"({sorted(namespaces)}); pass ingest_id=... to build_index/"
        "Index.ingest — reuse an existing id to (idempotently) retry "
        "that ingest, or a new id to append new data"
    )


def build_index(
    spark,
    source,
    index_dir: str,
    config: IndexConfig | None = None,
    n_splits: int = 8,
    resume: bool = True,
    ingest_id: str | None = None,
    retain_history: bool = False,
) -> Catalog:
    """Build (or resume) the index for ``source`` (DataFrame or parquet
    path of transcripts). One Spark job: shuffle by routing hash, build
    each split in a vectorized kernel, then stage+publish per split.

    Resume semantics (publisher.rs:140-148 / checkpoint.rs analog):
    partitions whose checkpoint position is already recorded under THIS
    ingest's namespace are filtered out *before* the shuffle, so a
    re-run after a crash only rebuilds missing splits, while a new
    ``ingest_id`` appends a fresh set of splits.
    """
    from pyspark.sql import functions as F

    config = config or IndexConfig()
    if config.default_search_field is None:
        # BM25 doc length = default-field token count (locked engine
        # invariant) — a search-only no-default-field config (valid for
        # query parsing per query_builder.rs:45-52) cannot be indexed
        raise ValueError(
            "indexing requires a default_search_field (BM25 doc length "
            "is the default field's token count)"
        )
    if isinstance(source, str):
        df = spark.read.parquet(source)
        source_path = source
    else:
        df = source
        source_path = None

    if resume and Catalog.exists(index_dir):
        catalog = Catalog.load(index_dir)
        _migrate_legacy_checkpoint(catalog)
    else:
        # retain_history=True (manifest backend) keeps superseded
        # manifests so Searcher(at_seq=...) can time-travel past commits
        catalog = Catalog.create(
            index_dir, config, source_path,
            backend="manifest" if retain_history else None,
            retain_history=retain_history,
        )
    ingest_id = _resolve_ingest_id(catalog, source, ingest_id)
    marker_key = f"batch/{ingest_id}"
    if catalog.checkpoint.get(marker_key) == "complete":
        return catalog  # idempotent retry of a finished ingest
    done = {
        int(k.rsplit("/", 1)[1])
        for k, pos in catalog.checkpoint.items()
        if k.startswith(marker_key + "/") and pos == "done"
    }
    todo = [p for p in range(n_splits) if p not in done]
    if not todo:
        # crashed exactly between the last chunk and nothing else —
        # just record completion
        catalog.stage_and_publish([], checkpoint_delta={marker_key: "complete"})
        return catalog

    df = df.withColumn(
        "split_ord",
        F.pmod(
            F.crc32(F.encode(F.col(config.routing_field).cast("string"), "utf-8")),
            F.lit(n_splits),
        ).cast("long"),
    )
    if done:
        df = df.filter(~F.col("split_ord").isin([int(p) for p in done]))

    index_dir_b = index_dir
    config_dict = config.to_dict()
    ingest_id_b = ingest_id

    def build_group(key, tbl):
        import pyarrow as pa

        split_ord = int(
            key[0].as_py() if hasattr(key[0], "as_py") else key[0]
        )
        cfg = IndexConfig.from_dict(config_dict)
        t0 = time.time()
        postings, docs, meta = build_split_tables_arrow(
            tbl.drop_columns(["split_ord"]), cfg
        )
        split_id = split_id_for_partition(ingest_id_b, split_ord)
        from quickwit_spark.functions import fs as fsio

        split_dir = fsio.join(index_dir_b, "splits", split_id)
        size = write_split(postings, docs, split_dir)
        meta.update(
            split_id=split_id,
            split_ord=split_ord,
            size_in_bytes=size,
            wall_time_sec=time.time() - t0,
        )
        return pa.table(
            {"split_ord": [split_ord], "meta": [json.dumps(meta)]}
        )

    results = (
        df.groupBy("split_ord")
        .applyInArrow(build_group, schema="split_ord long, meta string")
        .collect()
    )

    lineage = []
    ordered = sorted(results, key=lambda r: r.split_ord)
    # adaptive chunking: at least PUBLISH_CHUNK splits per atomic
    # commit, at most ~8 commits per run — catalog rewrites are pure
    # overhead once the run is small relative to the chunk count
    chunk_size = max(PUBLISH_CHUNK, -(-len(ordered) // 8))
    for i in range(0, len(ordered), chunk_size):
        chunk = ordered[i : i + chunk_size]
        metas = []
        for row in chunk:
            meta = json.loads(row.meta)
            metas.append(meta)
        sms = [
            SplitMetadata(
                split_id=m["split_id"],
                num_docs=m["num_docs"],
                sum_doc_len=m["sum_doc_len"],
                uncompressed_docs_size_in_bytes=m["uncompressed_docs_size_in_bytes"],
                size_in_bytes=m["size_in_bytes"],
                time_range=tuple(m["time_range"]) if m["time_range"] else None,
                term_range=tuple(m["term_range"]) if m["term_range"] else None,
                tags=m["tags"],
                tag_has_null=m.get("tag_has_null", {}),
                source_partitions=[m["split_ord"]],
            )
            for m in metas
        ]
        delta = {f"{marker_key}/{m['split_ord']}": "done" for m in metas}
        if i + chunk_size >= len(ordered):
            delta[marker_key] = "complete"  # same atomic commit as the last chunk
        catalog.stage_and_publish(sms, checkpoint_delta=delta)
        for sm, m in zip(sms, metas):
            lineage.append(
                {
                    "split_id": sm.split_id,
                    "op": "build",
                    "partition": m["split_ord"],
                    "num_docs": sm.num_docs,
                    "size_in_bytes": sm.size_in_bytes,
                    "term_min": sm.term_range[0] if sm.term_range else None,
                    "term_max": sm.term_range[1] if sm.term_range else None,
                    "wall_time_sec": m["wall_time_sec"],
                    "ts": time.time(),
                }
            )
    catalog.append_lineage(lineage)
    from quickwit_spark.operators.stats import refresh_term_stats

    refresh_term_stats(spark, catalog)
    return catalog
