#!/usr/bin/env python3
"""Generate an N-times perturbed replica of a testdata dir's documents
and embeddings tables for the graft.ScaleProbe experiment.

Each replica k gets: doc_id/vec_id offset by k*stride; a unique 'rep<k>tok'
text prefix (so shingles/signatures differ per replica and dedup stays
non-degenerate); the embedding array rotated by k positions (so LSH
buckets and cosines differ per replica). Replica 0 is the original.

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
    con.execute(f"""
    COPY (
      SELECT doc_id + {stride}*r.k AS doc_id,
             CASE WHEN r.k = 0 THEN text
                  ELSE 'rep' || r.k || 'tok ' || text END AS text,
             lang, source,
             -- keep the n_chars == length(text) invariant the quality
             -- and stats operators rely on
             CASE WHEN r.k = 0 THEN n_chars
                  ELSE n_chars + length('rep' || r.k || 'tok ') END AS n_chars
      FROM '{src}/documents.parquet',
           (SELECT unnest(generate_series(0, {n - 1})) AS k) r
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT vec_id + {stride}*r.k AS vec_id,
             list_concat(list_slice(embedding, r.k + 1, 64),
                         list_slice(embedding, 1, r.k)) AS embedding,
             label
      FROM '{src}/embeddings.parquet',
           (SELECT unnest(generate_series(0, {n - 1})) AS k) r
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    docs = con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    embs = con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    print(f"wrote {dst}: {docs} docs, {embs} embeddings ({n} replicas)")


if __name__ == "__main__":
    main()
