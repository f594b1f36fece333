#!/usr/bin/env python3
"""Generate an N-times perturbed replica of a testdata dir for the
graft.ScaleProbe experiment and the above-sf0.1 oracle envelope.

Each replica k gets: doc_id/vec_id offset by k*stride; a unique 'rep<k>tok'
text prefix (so shingles/signatures differ per replica and dedup stays
non-degenerate); a deterministic ZIPFIAN token tail (so the corpus
vocabulary widens toward a real corpus's shape — see below); the
embedding array rotated by k positions (so LSH buckets and cosines
differ per replica). Replica 0 is the original.

The tail (r12): the driver's synthetic documents hold a ~31-word
vocabulary, which is nothing like the ~10^8-token Zipf vocabulary a
real corpus has — and the shape matters, because the freq family's
class-crossing behavior depends on how batch-hit token counts sit
against powers of two. Each replica k>=1 doc gains TAIL_TOKENS extra
tokens 'zw<rank>' with rank drawn log-uniformly from [1, ZIPF_VOCAB]
(log-uniform rank sampling = P(rank r) proportional to 1/r, i.e. Zipf
counts). The rank hashes from (text, k, position) — NOT doc_id — so
two source docs with identical text keep identical replica texts and
the within-replica exact/near-dup structure survives. n_chars is
recomputed to keep the n_chars == length(text) invariant.

The FACT tables replicate too (r9): lineitem/orders with the order key
offset by k*1000003 (NOT a multiple of 32, so each replica lands on new
pixel rows y=(l_orderkey%32) instead of duplicating cells), events with
offset event/user ids, and the five dimension tables hard-linked from
the source — so the ENTIRE query surface, not just the text/vector
families, is runnable and DuckDB-checkable at N x the corpus.
Everything is a deterministic pure function of the source tables.

Usage: scalegen.py <src_dir> <dst_dir> [n=8] [stride=5000]
"""
import sys

import duckdb


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    stride = int(sys.argv[4]) if len(sys.argv) > 4 else 5000
    import os
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    ZIPF_VOCAB = 10000
    TAIL_TOKENS = 6
    # one log-uniform Zipf token per (text, replica, position): identical
    # source texts map to identical replica texts (dup structure survives)
    tail = " || ".join(
        f"' zw' || CAST(1 + floor(exp(ln({ZIPF_VOCAB}) * "
        f"(hash(text || '|' || r.k || '|{j}') % 1048576) / 1048576.0)) "
        f"AS BIGINT)"
        for j in range(TAIL_TOKENS))
    con.execute(f"""
    COPY (
      SELECT doc_id, text, lang, source,
             -- keep the n_chars == length(text) invariant the quality
             -- and stats operators rely on
             CAST(length(text) AS BIGINT) AS n_chars
      FROM (
        SELECT doc_id + {stride}*r.k AS doc_id,
               CASE WHEN r.k = 0 THEN text
                    ELSE 'rep' || r.k || 'tok ' || text || {tail} END AS text,
               lang, source
        FROM '{src}/documents.parquet',
             (SELECT unnest(generate_series(0, {n - 1})) AS k) r
      )
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    # rotation runs mod 64 (dim count): past k=63 a raw k-rotation slices
    # empty and every later replica would EXACTLY duplicate replica 0's
    # vectors. Replicas k>=64 additionally scale the first post-rotation
    # element by (1 + k//64) so the k and k+64 replicas stay distinct
    # vectors (same direction family, different value) — byte-identical
    # to the old output for k < 64, so the sf1/8x corpora are unchanged.
    con.execute(f"""
    COPY (
      SELECT vec_id + {stride}*r.k AS vec_id,
             list_transform(
               list_concat(list_slice(embedding, (r.k % 64) + 1, 64),
                           list_slice(embedding, 1, r.k % 64)),
               (v, i) -> CASE WHEN i = 1
                         THEN CAST(v * (1 + r.k // 64) AS FLOAT)
                         ELSE v END) AS embedding,
             label
      FROM '{src}/embeddings.parquet',
           (SELECT unnest(generate_series(0, {n - 1})) AS k) r
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    okey_stride = 1000003  # NOT divisible by 32: replicas shift y
    con.execute(f"""
    COPY (
      SELECT l_orderkey + {okey_stride}*r.k AS l_orderkey,
             l_partkey, l_suppkey, l_linenumber, l_quantity,
             l_extendedprice, l_discount, l_tax, l_returnflag,
             l_linestatus, l_shipdate
      FROM '{src}/lineitem.parquet',
           (SELECT unnest(generate_series(0, {n - 1})) AS k) r
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT o_orderkey + {okey_stride}*r.k AS o_orderkey,
             o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority
      FROM '{src}/orders.parquet',
           (SELECT unnest(generate_series(0, {n - 1})) AS k) r
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)
    # events.ts has shipped in two physical vintages (INT64
    # TIMESTAMP(NANOS) through round 9; plain timestamp[us] since the
    # round-10 regeneration) and Tables.events adapts to whichever it
    # reads — so the replica must PRESERVE the driver's current physical
    # type rather than retype it. A DuckDB rewrite would silently coerce
    # to micros; pyarrow round-trips the source schema exactly, so the
    # scale envelope always tests the same vintage the driver tests
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    ev = pq.read_table(f'{src}/events.parquet')
    reps = []
    for k in range(n):
        t = ev
        if k:
            t = t.set_column(t.schema.get_field_index('event_id'), 'event_id',
                             pc.add(t['event_id'], 10000000 * k))
            t = t.set_column(t.schema.get_field_index('user_id'), 'user_id',
                             pc.add(t['user_id'], 100000 * k))
        reps.append(t)
    # Seed THRESHOLD-CROSSING days (r13): replication preserves per-day
    # means (every replica repeats the same ts/value rows), so a source
    # whose day series never crosses the -3.0 abrupt-drop threshold
    # yields a 0-row e03 at EVERY scale — the flagship event query's
    # scale row was vacuously green. Six synthetic days appended after
    # the source's last day, with fully controlled means (only seeded
    # events land there), exercise all three classification branches
    # (quality.py:127-154): 50 -> 40 -> 50 is a transient_anomaly
    # (drop -10, recovery +10), 50 -> 45 -> 44.8 a possible_fire_or_
    # harvest (drop -5, no recovery), 44.8 -> 40 on the final day a
    # recent_event (no next scene). 45/44.8/40 also sit under the 49.7
    # sustained-low bar with a 50.0 scene three back, keeping e04
    # non-trivial. Deterministic, scale-invariant (seeded once, not per
    # replica), and both engines read the same parquet — the oracle
    # recomputes everything from these rows.
    import datetime as dt
    maxts = pc.max(ev['ts']).as_py()
    base = maxts.date() + dt.timedelta(days=1)
    plan = [(0, 50.0), (1, 40.0), (2, 50.0), (3, 45.0), (4, 44.8), (5, 40.0)]
    cols = {c: [] for c in ev.column_names}
    eid = 2_000_000_000
    for off, mean in plan:
        for j, dv in enumerate([-1.5, -0.5, 0.5, 1.5]):
            cols['event_id'].append(eid)
            eid += 1
            cols['ts'].append(dt.datetime.combine(
                base + dt.timedelta(days=off), dt.time(hour=6 + j)))
            cols['user_id'].append(999983)
            cols['event_type'].append('view')
            cols['value'].append(mean + dv)
            cols['props'].append('{}')
    seed = pa.table(
        {c: pa.array(cols[c], type=ev.schema.field(c).type)
         for c in ev.column_names})
    allev = [t.replace_schema_metadata(None) for t in reps] + [seed]
    pq.write_table(pa.concat_tables(allev), f'{dst}/events.parquet')
    for t in ['region', 'nation', 'customer', 'supplier', 'part']:
        dstf = f'{dst}/{t}.parquet'
        if not os.path.exists(dstf):
            os.link(f'{src}/{t}.parquet', dstf)
    docs = con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    embs = con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    li = con.sql(f"SELECT count(*) FROM '{dst}/lineitem.parquet'").fetchone()[0]
    print(f"wrote {dst}: {docs} docs, {embs} embeddings, {li} lineitems ({n} replicas)")


if __name__ == "__main__":
    main()
