#!/usr/bin/env python3
"""Self-generated scale points above sf0.1 (round-9 verdict item 5).

/root/testdata stops at sf0.1, so the 100 TB scaling arguments had no
empirical point past it. This builds xK replicas (K=1,2,3) of the
sf0.1 tables the scale-sensitive bench tier reads, under /tmp by
default (NEVER under /root/testdata — read-only):

  lineitem  - l_orderkey/l_partkey offset per replica: the order count
              AND the part space both scale, the TPC-H scaling model,
              so the co-purchase graph grows ~linearly in SF (K
              disjoint components of the x1 graph — proportionate
              growth, the honest replica semantics).
  part      - p_partkey offset to match; p_brand kept, so q82's
              baskets-per-brand scale linearly at fixed brand count.
  documents - doc_id offset; for replicas k>0 every 3rd word gets a
              ~k suffix, so EVERY word 3-gram differs across replicas
              (no cross-replica shingle collisions: the dedup tier
              sees K independent corpora, and pair volume scales
              linearly like a real corpus, instead of the x9
              everything-is-a-duplicate artifact literal copies would
              create). Word count, doc length shape, and within-
              replica near-dup structure are preserved exactly.
              ns46's query set (every 50th doc) scales WITH the
              corpus, so BM25 candidate volume = queries x sum(df)
              grows ~quadratically in SF by design — documented as
              that query's expected exponent, not a surprise.

x1 is byte-for-byte the sf0.1 inputs re-emitted through the same
writer, so the three points are generator-consistent and exponent
fits (log t ~ e log K) are meaningful.

Usage: python3 tools/make_scaledata.py [outRoot=/tmp/scaledata]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(out_root, ks=(1, 2, 3)):
    con = duckdb.connect()
    for k in ks:
        d = os.path.join(out_root, f"x{k}")
        os.makedirs(d, exist_ok=True)
        reps = ", ".join(str(r) for r in range(k))
        con.execute(f"""
            COPY (
              WITH bounds AS (
                SELECT (max(l_orderkey) + 1) AS ok_off,
                       (SELECT max(p_partkey) + 1
                        FROM '{SRC}/part.parquet') AS pk_off
                FROM '{SRC}/lineitem.parquet')
              SELECT l_orderkey + r * ok_off AS l_orderkey,
                     l_partkey + r * pk_off AS l_partkey,
                     l_suppkey, l_linenumber, l_quantity,
                     l_extendedprice, l_discount, l_tax, l_returnflag,
                     l_linestatus, l_shipdate
              FROM '{SRC}/lineitem.parquet'
              CROSS JOIN bounds CROSS JOIN unnest([{reps}]) AS t(r)
            ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
            COPY (
              WITH bounds AS (
                SELECT (max(p_partkey) + 1) AS pk_off
                FROM '{SRC}/part.parquet')
              SELECT p_partkey + r * pk_off AS p_partkey, p_name,
                     p_brand, p_type, p_size, p_retailprice
              FROM '{SRC}/part.parquet'
              CROSS JOIN bounds CROSS JOIN unnest([{reps}]) AS t(r)
            ) TO '{d}/part.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
            COPY (
              WITH bounds AS (
                SELECT (max(doc_id) + 1) AS id_off
                FROM '{SRC}/documents.parquet')
              SELECT doc_id + r * id_off AS doc_id,
                     CASE WHEN r = 0 THEN text
                          ELSE array_to_string(list_transform(
                            string_split(text, ' '),
                            (w, i) -> CASE WHEN i % 3 = 0
                                      THEN w || '~' || r
                                      ELSE w END), ' ') END AS text,
                     lang, source,
                     length(CASE WHEN r = 0 THEN text
                          ELSE array_to_string(list_transform(
                            string_split(text, ' '),
                            (w, i) -> CASE WHEN i % 3 = 0
                                      THEN w || '~' || r
                                      ELSE w END), ' ') END)::BIGINT
                       AS n_chars
              FROM '{SRC}/documents.parquet'
              CROSS JOIN bounds CROSS JOIN unnest([{reps}]) AS t(r)
            ) TO '{d}/documents.parquet' (FORMAT PARQUET)""")
        for t in ("lineitem", "part", "documents"):
            n = con.execute(
                f"SELECT count(*) FROM '{d}/{t}.parquet'").fetchone()[0]
            print(f"x{k} {t}: {n} rows")


def skew(out_root, ks=(1, 3, 5), base=30000):
    """Power-law (Zipf) document corpus for the skewed bench tier
    (round-10 verdict item 5): the proportionate replicas above grow
    every bucket uniformly, so the df caps / band sub-splits — which
    exist precisely for power-law data — were never benched against
    one. Each doc is 10 "head" slots drawn Zipf(s=1) from a 1000-term
    vocabulary (the head term z1 is genuinely hot — the run prints the
    measured top document frequencies, which are authoritative;
    observed ~65%% of docs) followed by 30 doc-unique
    tail words (so few TRUE near-dup pairs exist: the skew stresses
    CANDIDATE volume, not output volume). Deterministic via hash();
    x1/x3/x5 are prefix-consistent (xK's first base*J docs == xJ's).
    Only documents.parquet is emitted — the skew probes
    (SPARK_GRAFT_BENCH_ONLY) read nothing else.
    """
    con = duckdb.connect()
    for k in ks:
        d = os.path.join(out_root, f"x{k}")
        os.makedirs(d, exist_ok=True)
        n = base * k
        con.execute(f"""
            COPY (
              SELECT doc_id, text, lang, source,
                     length(text)::BIGINT AS n_chars
              FROM (
                SELECT d AS doc_id,
                  array_to_string(
                    ['z' || CAST(floor(pow(1000.0,
                        ((hash(d * 97 + j) % 1000003) / 1000003.0)))
                       AS BIGINT)
                     FOR j IN range(0, 10)]
                    || ['u' || CAST(hash(d * 131 + 7919 * j)
                          % 1000000007 AS VARCHAR)
                        FOR j IN range(10, 40)],
                    ' ') AS text,
                  'en' AS lang,
                  'src' || CAST(d % 3 AS VARCHAR) AS source
                FROM range(0, {n}) t(d))
            ) TO '{d}/documents.parquet' (FORMAT PARQUET)""")
        top = con.execute(f"""
            SELECT term, count(*) AS df FROM (
              SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                AS term FROM '{d}/documents.parquet')
            GROUP BY 1 ORDER BY df DESC LIMIT 3""").fetchall()
        print(f"x{k} documents: {n} rows; top df: "
              + ", ".join(f"{t}={c} ({c / n:.0%})" for t, c in top))


def skew_embeddings(out_root, ks=(1, 3, 5), base=6000, dim=64):
    """Clustered embedding corpus for the semantic-dedup skew tier
    (round-11: the occupancy cap on semDedup's IVF cells needs a
    corpus where one embedding cluster dominates — the proportionate
    replicas spread near-uniformly over cells and hide the Sum|cell|^2
    quadratic exactly like the uniform documents hid the posting-list
    one). 70%% of vectors sit in a tight cone around the all-ones
    direction (deterministic +-2.5%% per-coordinate jitter), so they
    collapse into a handful of IVF cells whose occupancy is a constant
    fraction of N; the other 30%% are centered-uniform directions that
    spread across cells. Deterministic via hash(); prefix-consistent
    like skew(). Emits embeddings.parquet only — the ns44/ns44b probes
    read nothing else.
    """
    con = duckdb.connect()
    for k in ks:
        d = os.path.join(out_root, f"x{k}")
        os.makedirs(d, exist_ok=True)
        n = base * k
        con.execute(f"""
            COPY (
              SELECT v AS vec_id,
                CASE WHEN v % 10 < 7
                  THEN [(1.0 + 0.05 * ((hash(v * 73 + j) % 2000003)
                          / 2000003.0 - 0.5))::FLOAT
                        FOR j IN range(0, {dim})]
                  ELSE [((hash(v * 73 + j) % 2000003)
                          / 2000003.0 - 0.5)::FLOAT
                        FOR j IN range(0, {dim})]
                END AS embedding,
                (v % 10)::INT AS label
              FROM range(0, {n}) t(v)
            ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)""")
        print(f"x{k} embeddings: {n} rows ({dim}-dim, 70% clustered)")


def skew_graph(out_root, ks=(1, 3, 5), base=30000, n_parts=10000):
    """Power-law-degree co-purchase graph for the graph/fact skew tier
    (round-11: q93/q94/q101/q102 and q82 had only proportionate
    replicas, which grow every node's degree uniformly — the
    skew-handling claims were never measured against a hot node).
    Each of base*k orders holds 8 item slots drawn Zipf(s=1) from an
    n_parts space (head part z1 lands in a CONSTANT ~40-50%% of
    orders — the run prints the measured head share, which is
    authoritative), so the co-occurrence graph has a genuinely hot
    node whose degree grows with N while the typical degree stays
    flat, and the hot part's brand dominates q82's basket pairs.
    Deterministic via hash(); prefix-consistent like skew(). Emits
    lineitem.parquet + part.parquet — everything the graph family and
    q82 read.
    """
    con = duckdb.connect()
    for k in ks:
        d = os.path.join(out_root, f"x{k}")
        os.makedirs(d, exist_ok=True)
        n = base * k
        con.execute(f"""
            COPY (
              SELECT o AS l_orderkey,
                CAST(floor(pow({n_parts}.0,
                    ((hash(o * 131 + j) % 1000003) / 1000003.0)))
                  AS BIGINT) AS l_partkey,
                (hash(o * 17 + j) % 100)::BIGINT AS l_suppkey,
                j::INT AS l_linenumber,
                (1 + hash(o + j) % 50)::DOUBLE AS l_quantity,
                (900 + hash(o * 7 + j) % 100000)::DOUBLE / 100.0
                  AS l_extendedprice,
                (hash(o * 11 + j) % 11)::DOUBLE / 100.0 AS l_discount,
                (hash(o * 13 + j) % 9)::DOUBLE / 100.0 AS l_tax,
                CASE hash(o * 19 + j) % 3 WHEN 0 THEN 'A'
                  WHEN 1 THEN 'N' ELSE 'R' END AS l_returnflag,
                CASE hash(o * 23 + j) % 2 WHEN 0 THEN 'O' ELSE 'F' END
                  AS l_linestatus,
                TIMESTAMP '1995-01-01' + INTERVAL (hash(o * 29 + j)
                  % 2000) DAY AS l_shipdate
              FROM range(0, {n}) t(o)
              CROSS JOIN unnest([0, 1, 2, 3, 4, 5, 6, 7]) s(j)
            ) TO '{d}/lineitem.parquet' (FORMAT PARQUET)""")
        con.execute(f"""
            COPY (
              SELECT p AS p_partkey,
                'part-' || CAST(p AS VARCHAR) AS p_name,
                'Brand#' || CAST(p % 25 AS VARCHAR) AS p_brand,
                'TYPE ' || CAST(p % 7 AS VARCHAR) AS p_type,
                (1 + p % 50)::INT AS p_size,
                (900 + p % 1000)::DOUBLE AS p_retailprice
              FROM range(1, {n_parts} + 1) t(p)
            ) TO '{d}/part.parquet' (FORMAT PARQUET)""")
        head = con.execute(f"""
            SELECT count(DISTINCT l_orderkey) FROM '{d}/lineitem.parquet'
            WHERE l_partkey = 1""").fetchone()[0]
        deg = con.execute(f"""
            WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey
              AS pk FROM '{d}/lineitem.parquet')
            SELECT count(DISTINCT b.pk) FROM op a JOIN op b
            ON a.ok = b.ok AND a.pk <> b.pk WHERE a.pk = 1""").fetchone()[0]
        print(f"x{k} lineitem: {n * 8} rows; head part in "
              f"{head / n:.0%} of orders, degree {deg}")


def skew_events(out_root, ks=(1, 3, 5), base=100000):
    """Hot-key CDC event stream for the SCD2/merge skew tier
    (round-12: the reference's flagship path — versioned upsert /
    current-flag / snapshot over events — had skew tiers for every
    analytic family but had never been benched under a hot business
    key). One entity (user_id 0) receives a CONSTANT ~45%% of events
    (the realistic CRM skew: a system account, a monitoring bot, a
    house account), so its version-history window partition grows
    with N while the typical user's stays flat (~28 events: the user
    space scales with N). Deterministic via hash();
    prefix-consistent like skew(). Emits events.parquet only — the
    q20/q21/q34 probes read nothing else. The run prints the
    measured hot share, which is authoritative.
    """
    con = duckdb.connect()
    for k in ks:
        d = os.path.join(out_root, f"x{k}")
        os.makedirs(d, exist_ok=True)
        n = base * k
        users = max(n // 50, 1)
        con.execute(f"""
            COPY (
              SELECT e AS event_id,
                TIMESTAMP '2024-01-01' + INTERVAL (e % 2591999) SECOND
                  AS ts,
                (CASE WHEN hash(e * 41 + 3) % 100 < 45 THEN 0
                      ELSE 1 + hash(e * 59 + 11) % {users}
                 END)::BIGINT AS user_id,
                ['view', 'click', 'purchase', 'signup', 'error']
                  [(1 + hash(e * 31 + 5) % 5)::BIGINT] AS event_type,
                (hash(e * 43 + 9) % 100000)::DOUBLE / 100.0 AS value,
                '{{"k": ' || CAST(hash(e * 53 + 13) % 100 AS VARCHAR)
                  || '}}' AS props
              FROM range(0, {n}) t(e)
            ) TO '{d}/events.parquet' (FORMAT PARQUET)""")
        hot = con.execute(f"""
            SELECT count(*) FILTER (user_id = 0)::DOUBLE / count(*)
            FROM '{d}/events.parquet'""").fetchone()[0]
        print(f"x{k} events: {n} rows; hot user share {hot:.0%}, "
              f"user space {users}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--skew-graph":
        skew_graph(sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewgraph",
                   tuple(int(x) for x in sys.argv[3].split(","))
                   if len(sys.argv) > 3 else (1, 3, 5))
    elif len(sys.argv) > 1 and sys.argv[1] == "--skew":
        skew(sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewdata",
             tuple(int(x) for x in sys.argv[3].split(","))
             if len(sys.argv) > 3 else (1, 3, 5))
    elif len(sys.argv) > 1 and sys.argv[1] == "--skew-events":
        skew_events(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewevents",
            tuple(int(x) for x in sys.argv[3].split(","))
            if len(sys.argv) > 3 else (1, 3, 5))
    elif len(sys.argv) > 1 and sys.argv[1] == "--skew-emb":
        skew_embeddings(
            sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewemb",
            tuple(int(x) for x in sys.argv[3].split(","))
            if len(sys.argv) > 3 else (1, 3, 5))
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaledata",
             tuple(int(x) for x in sys.argv[2].split(",")) if len(sys.argv) > 2
             else (1, 2, 3))
