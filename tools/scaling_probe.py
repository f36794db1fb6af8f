#!/usr/bin/env python3
"""Build a K-times scaled variant of the sf0.1 documents corpus for
the scaling probe (tools/scaling_probe.sh).

Each replica k suffixes every token with a replica salt ("wk1", ...),
so replicas share NO shingles: cross-replica candidate pairs are
impossible and the corpus grows like independent content — the
natural-growth regime a 100 TB crawl has — instead of the
pathological every-doc-has-K-copies regime a plain union would
measure. doc_ids shift by k*10_000_000. Non-document tables are
symlinked from sf0.1 (only the documents family is probed).
"""
import os
import sys
import duckdb

K = int(sys.argv[1])
OUT = sys.argv[2]
SRC = "/root/testdata/sf0.1"

os.makedirs(OUT, exist_ok=True)
for t in ("region", "nation", "supplier", "embeddings"):
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)

con = duckdb.connect()
reps = "\nUNION ALL\n".join(
    f"""SELECT doc_id + {k * 10000000} AS doc_id,
               regexp_replace(text, '(\\S+)', '\\1k{k}', 'g') AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')"""
    for k in range(K))
con.execute(f"COPY ({reps}) TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
n = con.execute(
    f"SELECT count(*) FROM read_parquet('{OUT}/documents.parquet')").fetchone()[0]
# events scale by replicating USERS (shifted user/event ids, same
# timestamps): K independent user populations — the natural-growth
# regime for the sessionize/funnel/markov/retention interval logic,
# whose per-user state must not couple across users
evs = "\nUNION ALL\n".join(
    f"""SELECT event_id + {k * 100000000} AS event_id, ts,
               user_id + {k * 10000000} AS user_id,
               event_type, value, props
        FROM read_parquet('{SRC}/events.parquet')"""
    for k in range(K))
con.execute(f"COPY ({evs}) TO '{OUT}/events.parquet' (FORMAT PARQUET)")
ne = con.execute(
    f"SELECT count(*) FROM read_parquet('{OUT}/events.parquet')").fetchone()[0]
# the trading graph scales by replicating the FACT tables with salted
# keys (orderkey +k*1e9, custkey/suppkey +k*1e7): K disjoint trading
# graphs — co-supply pairs and rank flow cannot cross replicas, so
# per-round shuffle volume doubles while component diameters (and so
# loop round counts) stay fixed — the natural-growth regime for the
# iterative graph family. suppkey offsets stay far under the sweep's
# 2^44 node-id headroom.
# l_partkey salts too: the basket family (co-purchase pairs, rules,
# link prediction) needs K disjoint basket universes — shared parts
# would inflate pair co-occurrence counts K-fold and change the
# thresholded graph's density, measuring semantics drift instead of
# scaling. No probed operator joins lineitem to the part table.
li = "\nUNION ALL\n".join(
    f"""SELECT * REPLACE (l_orderkey + {k * 1000000000} AS l_orderkey,
               l_suppkey + {k * 10000000} AS l_suppkey,
               l_partkey + {k * 10000000} AS l_partkey)
        FROM read_parquet('{SRC}/lineitem.parquet')"""
    for k in range(K))
con.execute(f"COPY ({li}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)")
od = "\nUNION ALL\n".join(
    f"""SELECT * REPLACE (o_orderkey + {k * 1000000000} AS o_orderkey,
               o_custkey + {k * 10000000} AS o_custkey)
        FROM read_parquet('{SRC}/orders.parquet')"""
    for k in range(K))
con.execute(f"COPY ({od}) TO '{OUT}/orders.parquet' (FORMAT PARQUET)")
# customer replicates with the SAME custkey salt orders carries, so
# referential integrity holds per replica and the snapshot/SCD ops
# (keyed on custkey) see K disjoint dimension universes
cu = "\nUNION ALL\n".join(
    f"""SELECT * REPLACE (c_custkey + {k * 10000000} AS c_custkey)
        FROM read_parquet('{SRC}/customer.parquet')"""
    for k in range(K))
con.execute(f"COPY ({cu}) TO '{OUT}/customer.parquet' (FORMAT PARQUET)")
nl = con.execute(
    f"SELECT count(*) FROM read_parquet('{OUT}/lineitem.parquet')").fetchone()[0]
# part replicates with the SAME partkey salt lineitem carries, and each
# replica PREFIXES p_name with a 3-char replica tag of a distinct letter
# ('aaa ', 'bbb ', ...): cross-replica names differ in >= 3 positions, so
# no deletion-variant (<= 2 deletions) bucket and no <= tau=2 pair can
# cross replicas — K disjoint name universes, the natural-growth regime
# for the FastSS linkage probe (lengths stay far under the 64 guard)
pt = "\nUNION ALL\n".join(
    f"""SELECT * REPLACE (p_partkey + {k * 10000000} AS p_partkey,
               '{chr(ord('a') + k) * 3}' || ' ' || p_name AS p_name)
        FROM read_parquet('{SRC}/part.parquet')"""
    for k in range(K))
con.execute(f"COPY ({pt}) TO '{OUT}/part.parquet' (FORMAT PARQUET)")
print(f"wrote {OUT}: {n} docs, {ne} events, {nl} lineitems (K={K})")
