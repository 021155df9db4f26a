#!/usr/bin/env python3
"""Generate /tmp/sf1 — a 10x scale-up of /root/testdata/sf0.1 for the
growth-exponent sweep (PERF_sf1.json). COPIES=100 produces the sf10
probe fixture (round 14: 60M lineitem / 500k documents — the scale
that exposed the LSH broadcast-planning bug). Dev/bench tool only;
the correctness gate always runs on the driver's own sf0.01 fixtures.

Scaling rules (why each table is built the way it is):

- Relational tables (lineitem/orders/customer/supplier/part/events):
  10 copies with disjoint key ranges (shift per copy, multiples chosen
  to preserve the modulo-derived planting patterns: %5 blobs, %50
  planted dups, ...). Dimension tables region/nation stay 1x.
- documents: copies keep the ORIGINAL doc structure (lengths,
  templates, within-copy near-dup patterns identical to sf0.1) but
  suffix every non-stopword token with the copy id. Cross-copy token
  overlap is stopwords only, so cross-copy shingle Jaccard and simhash
  proximity sit at the random-pair level: near-dup mass scales
  LINEARLY, like a real corpus. (Two rejected alternatives, measured:
  verbatim copies make 90% of the corpus exact/near duplicates —
  candidate mass grows ~100x for 10x docs; fresh bag-of-words docs
  sampled from the shared unigram pool all simhash-cluster together —
  679M candidate pairs. Both measure corpus pathology, not engine
  scaling.)
- embeddings: copies rotate vector components (np.roll) so cross-copy
  cosine drops to the random level, and shift the label blocks so the
  blocked pair join grows linearly like bucketed candidate generation
  would.

Usage: python3 tools/gen_sf1.py [SRC] [DST] [COPIES] [TABLES]

TABLES (optional, comma-separated) restricts generation to a subset —
e.g. `documents` for the COPIES=1000 simhash width-step probe (round
15), where scaling 600M lineitem rows nobody reads would waste an
hour and 50 GB.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
DST = sys.argv[2] if len(sys.argv) > 2 else '/tmp/sf1'
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
TABLES = (set(sys.argv[4].split(',')) if len(sys.argv) > 4 else
          {'region', 'nation', 'lineitem', 'orders', 'customer',
           'supplier', 'part', 'events', 'documents', 'embeddings'})

STOP = {'the', 'a', 'of', 'and', 'to', 'in', 'is',
        'der', 'die', 'das', 'und', 'ist', 'ein',
        'el', 'la', 'de', 'y', 'es', 'un'}

# Bounded row groups (round 15): pq.write_table's default row-group
# size is 1Mi ROWS, so the COPIES=100 documents fixture came out as a
# single 229 MB row group — and Spark cannot split inside a row
# group, so the whole corpus scan (plus every codegen-fused per-row
# kernel: langid, quality, tokenize, simhash) ran as ONE task at
# local[32]. That serialized scan was most of llm_corpus_pipeline's
# "3.2x for 10x data" superlinear growth at sf10 — a fixture
# artifact, not an engine property (real 100-TB corpora are many
# files with writer-bounded row groups). Text/vector tables get row
# groups small enough to parallelize a single file; relational
# tables keep larger groups (their rows are ~100x smaller).
ROW_GROUP = {'documents': 25_000, 'embeddings': 50_000}
DEFAULT_ROW_GROUP = 1_000_000

SHIFTS = {
    'lineitem': {'l_orderkey': 1_000_000_000, 'l_partkey': 100_000_000,
                 'l_suppkey': 10_000_000},
    'orders': {'o_orderkey': 1_000_000_000, 'o_custkey': 10_000_000},
    'customer': {'c_custkey': 10_000_000},
    'supplier': {'s_suppkey': 10_000_000},
    'part': {'p_partkey': 100_000_000},
    'events': {'event_id': 1_000_000_000_000, 'user_id': 10_000_000},
}


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    for t in ['region', 'nation']:
        if t not in TABLES:
            continue
        pq.write_table(pq.read_table(f'{SRC}/{t}.parquet'), f'{DST}/{t}.parquet',
                       row_group_size=ROW_GROUP.get(t, DEFAULT_ROW_GROUP))
    for t, sh in SHIFTS.items():
        if t not in TABLES:
            continue
        src = pq.read_table(f'{SRC}/{t}.parquet')
        parts = []
        for c in range(COPIES):
            cols = []
            for f in src.schema:
                col = src.column(f.name)
                if f.name in sh and c > 0:
                    col = pc.add(col, pa.scalar(c * sh[f.name], type=f.type))
                cols.append(col)
            parts.append(pa.table(dict(zip(src.schema.names, cols)),
                                  schema=src.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f'{DST}/{t}.parquet',
                       row_group_size=ROW_GROUP.get(t, DEFAULT_ROW_GROUP))
        print(t, src.num_rows, '->', out.num_rows)

    if 'documents' in TABLES:
        src = pq.read_table(f'{SRC}/documents.parquet')
        texts = src.column('text').to_pylist()
        langs = src.column('lang').to_pylist()
        sources = src.column('source').to_pylist()
        ids = src.column('doc_id').to_pylist()
        parts = [src]
        for c in range(1, COPIES):
            tag = f'~{c}'
            new_texts = [' '.join(t if t.lower() in STOP else t + tag
                                  for t in s.split()) for s in texts]
            parts.append(pa.table({
                'doc_id': pa.array([i + c * 1_000_000 for i in ids], type=pa.int64()),
                'text': pa.array(new_texts, type=pa.string()),
                'lang': pa.array(langs, type=pa.string()),
                'source': pa.array(sources, type=pa.string()),
                'n_chars': pa.array([len(t) for t in new_texts], type=pa.int64()),
            }, schema=src.schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f'{DST}/documents.parquet',
                       row_group_size=ROW_GROUP['documents'])
        print('documents', src.num_rows, '->', out.num_rows)

    if 'embeddings' not in TABLES:
        return
    src = pq.read_table(f'{SRC}/embeddings.parquet')
    vecs = np.array(src.column('embedding').to_pylist(), dtype=np.float32)
    vid = np.array(src.column('vec_id').to_pylist())
    lab = np.array(src.column('label').to_pylist())
    parts = [src]
    for c in range(1, COPIES):
        rolled = np.roll(vecs, c, axis=1)
        parts.append(pa.table({
            'vec_id': pa.array(vid + c * 10_000_000, type=pa.int64()),
            'embedding': pa.array([row.tolist() for row in rolled],
                                  type=pa.list_(pa.float32())),
            'label': pa.array(lab + c * 1000, type=pa.int32()),
        }, schema=src.schema))
    out = pa.concat_tables(parts)
    pq.write_table(out, f'{DST}/embeddings.parquet',
                   row_group_size=ROW_GROUP['embeddings'])
    print('embeddings', src.num_rows, '->', out.num_rows)


if __name__ == '__main__':
    main()
