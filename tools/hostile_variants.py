"""Hostile testdata variants for the perturbation treadmill (SCALING.md):
build a transformed copy of an sf dir with DuckDB and sweep the catalog
against it via tools/driver_sim.py. Each variant perturbs STRUCTURE, not
just volume -- the r11 lesson: the two variants that found real bugs
(dup-heavy -> rank ties; fresh-salt -> grid means) changed data SHAPE.

    python tools/hostile_variants.py --variant nulls --sf-dir /root/testdata/sf0.01 --out-dir /tmp/v

Variants:
  nulls     -- every OPTIONAL / descriptive column goes all-NULL
               (documents.lang, events.props, embeddings.label,
               part.p_name, customer.c_mktsegment, orders.o_orderpriority):
               stresses null-group keys, tokenize(NULL), map lookups on
               NULL, from_json(NULL), label-eval with no labels.
  singlerow -- each table keeps exactly ONE row (min primary key):
               empty joins, empty groups, single-element windows,
               degenerate models, 1-doc dedup corpora.
  empty     -- every table ZERO rows (schema preserved): global
               aggregates over nothing, empty models, zero-batch
               streams; both engines must publish the same
               empty-or-NULL shape.
  salt      -- fresh-salt drift drop (~29%: md5(salt|key) %% 17 < 12):
               the regeneration-robustness family with a salt no oracle
               has ever seen.
  ties      -- every ranking surface fully tied: o_totalprice,
               l_extendedprice/l_discount, events.value constant, and
               every embedding the SAME vector. Rank keys collapse to
               their tie-breaks; any engine-order float key left in a
               window sort diverges here (the q16/t04 class,
               end-to-end).
  bigmoney  -- money columns scaled x1e7 (2dp grid kept): one group's
               exact cents sum crosses the 2^52 grid-mean exactness
               precondition, so every money_mean/grid_mean carrier must
               FAIL LOUDLY (catalog._grid_guard's split-groups message)
               rather than return a silently-inexact mean (r12 VERDICT
               task 4). Long sums stay in BIGINT range (1e17 cents).
  extremes  -- IEEE boundary values: events.value cycles +/-inf, NaN,
               +/-1e308, 5e-324 (subnormal) on event_id % 11 slices;
               events.user_id takes +/-2^63-adjacent longs on % 13
               slices. Stresses NaN grouping/ordering semantics, inf
               sums, overflow-adjacent long arithmetic -- both engines
               must degrade identically.
  dupx      -- every row of every table duplicated 100x (true
               duplicates): keyed joins fan out 1e4 per matched pair,
               dedup families see 100-deep duplicate classes (their
               broadcast gates must re-route), and the driver's
               multiset rows_match sees the full multiplicity.
  longstr   -- documents.text grown to >= 1 MiB on doc_id % 17 == 0
               (text repeated to the megabyte), n_chars recomputed for
               consistency: tokenizer / md5 / regex / shingle paths at
               pathological row widths.
  timex     -- timestamp extremes (r13 VERDICT axis a): events.ts takes
               epoch 0, the last pre-epoch microsecond, the int64-nanos
               ceiling day (2262-04-11), DST-transition instants
               (EU spring-forward / US fall-back) and a leap day on
               event_id %% 19 slices; orders.o_orderdate takes epoch 0 /
               pre-epoch / 2262 / leap day on o_orderkey %% 23 slices;
               lineitem.l_shipdate takes the proleptic-Gregorian floor
               0001-01-01, the 9999-12-31 ceiling and epoch 0 on
               (l_orderkey * 7 + l_linenumber) %% 29 slices. Stresses
               epoch conversion (F4), date formatting, day/month spines
               (q40/q45), interval overlap (q66), sessionization
               (q56/s03), EWMA day series (q86/s31), range frames (q41),
               and parquet timestamp rebase at the calendar boundaries.
  skew      -- one key holds ~99%% of rows (r13 VERDICT axis b):
               lineitem.l_partkey / l_suppkey collapse to their min key
               and l_returnflag to 'A' except on o_orderkey %% 100 == 0;
               orders.o_custkey likewise; events.user_id -> min user and
               event_type -> 'click' except on event_id %% 100 == 0;
               20%% of documents (doc_id %% 5 == 0) share ONE identical
               text (a hot dedup/LSH band + hot CDC chunk class, n_chars
               recomputed). Stresses the salted pair q22/q23 (salting
               must flatten task times, not just match the oracle),
               window partitions (q16/q26), dedup band buckets
               (d02/s26/s30 gate + fan-out behavior), and AQE skew
               handling generally.
  nullkeys  -- JOIN/GROUP KEYS go NULL on slices (r13 VERDICT axis c):
               orders.o_custkey (o_orderkey %% 7), lineitem.l_partkey
               (%% 11 of l_orderkey * 7 + l_linenumber) and l_suppkey
               (%% 13), customer.c_nationkey (c_custkey %% 17),
               events.user_id (event_id %% 7) and event_type
               (event_id %% 23). Unlike `nulls` (descriptive columns),
               this NULLs the EQUI-JOIN and grouping keys: inner/semi
               joins must drop them identically, outer joins must keep
               them unmatched, anti-join / NOT-IN semantics diverge
               loudly if any oracle uses NOT IN, and NULL groups must
               form the same single group in both engines.
  jsonx     -- events.props goes MALFORMED on event_id %% 17 slices
               (r15 axis): truncated mid-object, deep-nested (48 levels),
               duplicate keys, bare scalar, array-not-object, empty
               string, non-JSON garbage, JSON `null` literal, lone
               Unicode escape. Exercises every from_json / variant /
               json-extract consumer (q15/q37/s16/s06...): both engines
               must agree row-by-row on what parses and what degrades
               to NULL.
  schemadrift -- parquet schema drift on READ (r15 axis): every table's
               columns are written in REVERSED order; lineitem.
               l_linenumber is widened INT32 -> BIGINT; orders.
               o_orderkey/o_custkey and customer.c_custkey/c_nationkey
               are narrowed BIGINT -> INTEGER (values fit at test SFs).
               Any code that reads columns positionally, pins a physical
               schema, or assumes LongType ids diverges here; joins
               cross int32/int64 widths.
  nullx     -- COMBINED nullkeys x extremes (r15 axis): the nullkeys
               NULL slices land first, then the extremes IEEE values
               (inf/NaN/1e308/subnormal on value, +/-2^63-adjacent longs
               on user_id) land on the surviving rows. NULL keys and
               IEEE poison in the SAME build: quarantine logic that
               accidentally keys on `IS NOT NULL AND is finite` or
               NULL-safe joins that break under NaN group keys surface
               only in the combination.
  sfx2      -- sf-jump build (r15 axis): the input SF unioned with a
               second FK-consistent copy (every key family offset by
               10,000,000; copy-2 document texts get a per-doc suffix so
               the dedup corpus doesn't become 100%% twins; region/nation
               dims stay fixed). Doubles the volume through every gated
               path (PROBE_BROADCAST_SHINGLE_LIMIT, bucket_cap, q75 hist
               limit, broadcast thresholds) to prove small-SF-tuned gates
               flip to their shuffled fallbacks with identical results.
  rowgroup  -- every table rewritten with TINY parquet row groups
               (ROW_GROUP_SIZE 64; r15 axis): the same bytes shredded
               into hundreds/thousands of row groups per file. Stresses
               split planning, row-group pruning, predicate-pushdown
               evaluation per group, and any code that assumes one
               row group == one file or a sane groups-per-file ratio.
  tsdup     -- EVERY events row shares one timestamp (r15 axis: the
               `ties` philosophy applied to TIME): every tumbling/
               sliding/session window collapses to one bucket, every
               watermark is a tie, every latest-k / sessionization /
               as-of path must resolve purely on its documented
               tie-breaks. orders.o_orderdate likewise constant (one
               month spine step, zero date range).
  ctrlchars -- control / invisible characters in text (r15 axis, the
               unicode axis one rung down): on doc_id %% 31 slices,
               documents.text gains NUL, vertical tab, form feed,
               zero-width space/joiner, NBSP, RTL override, BOM, and a
               combining cluster; two dedicated slices plant
               space-vs-vertical-tab TWIN pairs ('ctl pair N' vs
               'ctl\\x0bpair N') -- the sharp edge: Java's \\s includes
               \\x0B, RE2's does not, so any normalization that
               delegates its whitespace CLASS to the engine's \\s
               diverges between Spark and DuckDB exactly here.
               n_chars recomputed.
  unicode   -- documents.text / part.p_name / events.event_type rewritten
               with multi-byte content: accents via replace, a per-doc
               appended token cycling CJK / Greek / Cyrillic / emoji
               (non-BMP surrogate pairs) / COMBINING diacritics;
               documents.n_chars recomputed to stay consistent. Stresses
               char-vs-byte length, md5-over-UTF-8, tokenizer splits,
               regex classes, groupBy on non-ASCII keys.
"""

from __future__ import annotations

import argparse
import os

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

KEYS = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey",
    "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id",
}

# deterministic per-doc unicode tail: CJK, Greek, Cyrillic, emoji
# (non-BMP), decomposed combining accent, Arabic (RTL)
UNI_TOKENS = [
    "日本語テキスト", "Ωμέγα-τεστ", "🚀🌟émoji", "naïve-café",
    "привет-мир", "é́clat", "نصعربي", "ß-straße",
]

NULLS = {
    "documents": ["lang"],
    "events": ["props"],
    "embeddings": ["label"],
    "part": ["p_name"],
    "customer": ["c_mktsegment"],
    "orders": ["o_orderpriority"],
}


def build(
    variant: str,
    sf_dir: str,
    out_dir: str,
    salt: str = "drift_r12a",
    keep_num: int = 12,
    keep_den: int = 17,
    dup_factor: int = 100,
) -> str:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"'{sf_dir}/{t}.parquet'"
        if variant == "salt":
            # the drift_sweep family (test_data_drift.py): drop rows by a
            # salted key hash -- fresh salt + fresh rate per round so no
            # oracle can be tuned to the current tables
            k = KEYS[t]
            if t in ("region", "nation"):
                sel = f"SELECT * FROM {src}"
            else:
                sel = (
                    f"SELECT * FROM {src} WHERE "
                    f"(('0x'||substr(md5('{salt}|'||{k}::VARCHAR),1,8))::UBIGINT)"
                    f"::BIGINT % {keep_den} < {keep_num}"
                )
        elif variant == "nulls" and t in NULLS:
            repl = ", ".join(
                f"CAST(NULL AS {typ}) AS {c}"
                for c, typ in (
                    (c, dict(
                        (r[0], r[1])
                        for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
                    )[c])
                    for c in NULLS[t]
                )
            )
            sel = f"SELECT * REPLACE ({repl}) FROM {src}"
        elif variant == "singlerow":
            sel = f"SELECT * FROM {src} ORDER BY {KEYS[t]} LIMIT 1"
        elif variant == "empty":
            sel = f"SELECT * FROM {src} LIMIT 0"
        elif variant == "ties" and t == "orders":
            sel = f"SELECT * REPLACE (1000.00::DOUBLE AS o_totalprice) FROM {src}"
        elif variant == "ties" and t == "lineitem":
            sel = (
                "SELECT * REPLACE (100.00::DOUBLE AS l_extendedprice,"
                f" 0.05::DOUBLE AS l_discount) FROM {src}"
            )
        elif variant == "ties" and t == "events":
            sel = f"SELECT * REPLACE (1.0::DOUBLE AS value) FROM {src}"
        elif variant == "ties" and t == "embeddings":
            # one shared vector: every cosine/L2 score is bit-identical,
            # so ANN/eval rankings collapse entirely onto their id
            # tie-breaks
            sel = (
                "SELECT vec_id,"
                " (SELECT embedding FROM {0} ORDER BY vec_id LIMIT 1) AS embedding,"
                " label FROM {0}".format(src)
            )
        elif variant == "bigmoney" and t == "orders":
            sel = (
                "SELECT * REPLACE (round(o_totalprice * 1e7, 2) AS o_totalprice)"
                f" FROM {src}"
            )
        elif variant == "bigmoney" and t == "lineitem":
            sel = (
                "SELECT * REPLACE (round(l_extendedprice * 1e7, 2)"
                f" AS l_extendedprice) FROM {src}"
            )
        elif variant == "extremes" and t == "events":
            sel = (
                "SELECT * REPLACE ("
                " CASE event_id % 11"
                "  WHEN 0 THEN 'infinity'::DOUBLE"
                "  WHEN 1 THEN '-infinity'::DOUBLE"
                "  WHEN 2 THEN 'nan'::DOUBLE"
                "  WHEN 3 THEN 1e308"
                "  WHEN 4 THEN -1e308"
                "  WHEN 5 THEN 5e-324"
                "  ELSE value END AS value,"
                " CASE event_id % 13"
                "  WHEN 0 THEN 9223372036854775807"
                "  WHEN 1 THEN -9223372036854775808"
                "  WHEN 2 THEN 9223372036854775806"
                "  ELSE user_id END AS user_id)"
                f" FROM {src}"
            )
        elif variant == "dupx":
            # dup_factor: x100 is the headline regime; all-pairs catalog
            # entries (ANN / near-dup lattices) legitimately cost
            # O(factor^2), so broad sweeps drop to x10 while the pins
            # keep x100 on the queries the axis actually broke
            sel = f"SELECT s.* FROM {src} s CROSS JOIN range({dup_factor})"
        elif variant == "timex" and t == "events":
            # spans stay bounded (1969..2262) so the day-spine carriers
            # (q40) produce ~107k-day fills, a correct-and-linear answer,
            # not a 2.9M-day compare explosion; the calendar-boundary
            # hunt (year 1 / 9999) rides on l_shipdate, which has no
            # spine carrier
            sel = (
                "SELECT * REPLACE ("
                " CASE event_id % 19"
                "  WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'"
                "  WHEN 1 THEN TIMESTAMP '1969-12-31 23:59:59.999999'"
                "  WHEN 2 THEN TIMESTAMP '2262-04-11 23:47:16.854775'"
                "  WHEN 3 THEN TIMESTAMP '2021-03-28 02:30:00'"
                "  WHEN 4 THEN TIMESTAMP '2021-11-07 01:30:00'"
                "  WHEN 5 THEN TIMESTAMP '2024-02-29 00:00:00'"
                "  ELSE ts END AS ts)"
                f" FROM {src}"
            )
        elif variant == "timex" and t == "orders":
            sel = (
                "SELECT * REPLACE ("
                " CASE o_orderkey % 23"
                "  WHEN 0 THEN TIMESTAMP '1970-01-01 00:00:00'"
                "  WHEN 1 THEN TIMESTAMP '1969-06-15 08:30:00'"
                "  WHEN 2 THEN TIMESTAMP '2262-04-11 00:00:00'"
                "  WHEN 3 THEN TIMESTAMP '2024-02-29 12:00:00'"
                "  ELSE o_orderdate END AS o_orderdate)"
                f" FROM {src}"
            )
        elif variant == "timex" and t == "lineitem":
            sel = (
                "SELECT * REPLACE ("
                " CASE (l_orderkey * 7 + l_linenumber) % 29"
                "  WHEN 0 THEN TIMESTAMP '0001-01-01 00:00:00'"
                "  WHEN 1 THEN TIMESTAMP '9999-12-31 23:59:59'"
                "  WHEN 2 THEN TIMESTAMP '1970-01-01 00:00:00'"
                "  ELSE l_shipdate END AS l_shipdate)"
                f" FROM {src}"
            )
        elif variant == "skew" and t == "lineitem":
            sel = (
                "SELECT * REPLACE ("
                " CASE WHEN l_orderkey % 100 = 0 THEN l_partkey"
                f"  ELSE (SELECT min(p_partkey) FROM '{sf_dir}/part.parquet') END"
                "  AS l_partkey,"
                " CASE WHEN l_orderkey % 100 = 0 THEN l_suppkey"
                f"  ELSE (SELECT min(s_suppkey) FROM '{sf_dir}/supplier.parquet') END"
                "  AS l_suppkey,"
                " CASE WHEN l_orderkey % 100 = 0 THEN l_returnflag"
                "  ELSE 'A' END AS l_returnflag)"
                f" FROM {src}"
            )
        elif variant == "skew" and t == "orders":
            sel = (
                "SELECT * REPLACE ("
                " CASE WHEN o_orderkey % 100 = 0 THEN o_custkey"
                f"  ELSE (SELECT min(c_custkey) FROM '{sf_dir}/customer.parquet') END"
                "  AS o_custkey)"
                f" FROM {src}"
            )
        elif variant == "skew" and t == "events":
            sel = (
                "SELECT * REPLACE ("
                " CASE WHEN event_id % 100 = 0 THEN user_id"
                f"  ELSE (SELECT min(user_id) FROM {src}) END AS user_id,"
                " CASE WHEN event_id % 100 = 0 THEN event_type"
                "  ELSE 'click' END AS event_type)"
                f" FROM {src}"
            )
        elif variant == "skew" and t == "documents":
            # a 20% identical-text class: ONE hot LSH band / CDC chunk
            # class / duplicate cluster -- dedup fan-out and gate stress
            # without the O(n^2) pair-list blow-up a 99% class would cost
            hot = (
                f"(SELECT text FROM {src} ORDER BY doc_id LIMIT 1)"
            )
            sel = (
                f"SELECT doc_id,"
                f" CASE WHEN doc_id % 5 = 0 THEN {hot} ELSE text END AS text,"
                " lang, source,"
                f" length(CASE WHEN doc_id % 5 = 0 THEN {hot} ELSE text END)"
                "  AS n_chars"
                f" FROM {src}"
            )
        elif variant == "nullkeys" and t == "orders":
            sel = (
                "SELECT * REPLACE (CASE WHEN o_orderkey % 7 = 0 THEN NULL"
                f" ELSE o_custkey END AS o_custkey) FROM {src}"
            )
        elif variant == "nullkeys" and t == "lineitem":
            sel = (
                "SELECT * REPLACE ("
                " CASE WHEN (l_orderkey * 7 + l_linenumber) % 11 = 0 THEN NULL"
                "  ELSE l_partkey END AS l_partkey,"
                " CASE WHEN (l_orderkey * 7 + l_linenumber) % 13 = 0 THEN NULL"
                "  ELSE l_suppkey END AS l_suppkey)"
                f" FROM {src}"
            )
        elif variant == "nullkeys" and t == "customer":
            sel = (
                "SELECT * REPLACE (CASE WHEN c_custkey % 17 = 0 THEN NULL"
                f" ELSE c_nationkey END AS c_nationkey) FROM {src}"
            )
        elif variant == "nullkeys" and t == "events":
            sel = (
                "SELECT * REPLACE ("
                " CASE WHEN event_id % 7 = 0 THEN NULL"
                "  ELSE user_id END AS user_id,"
                " CASE WHEN event_id % 23 = 0 THEN NULL"
                "  ELSE event_type END AS event_type)"
                f" FROM {src}"
            )
        elif variant == "longstr" and t == "documents":
            grown = (
                "CASE WHEN doc_id % 17 = 0 THEN repeat(text || ' ', "
                "CAST(ceil(1048576.0 / (length(text) + 1)) AS BIGINT)) "
                "ELSE text END"
            )
            sel = (
                f"SELECT doc_id, {grown} AS text, lang, source,"
                f" length({grown}) AS n_chars FROM {src}"
            )
        elif variant == "jsonx" and t == "events":
            deep = "{" + '"a":{' * 47 + '"k":1' + "}" * 47 + "}"
            sel = (
                "SELECT * REPLACE ("
                " CASE event_id % 17"
                "  WHEN 0 THEN substr(props, 1, greatest(length(props) - 2, 1))"  # truncated
                f"  WHEN 1 THEN '{deep}'"
                "  WHEN 2 THEN '{\"k\": 1, \"k\": 2}'"
                "  WHEN 3 THEN '42'"
                "  WHEN 4 THEN '[1, 2, 3]'"
                "  WHEN 5 THEN ''"
                "  WHEN 6 THEN 'not json at all'"
                "  WHEN 7 THEN 'null'"
                "  WHEN 8 THEN '{\"k\": \"\\ud800\"}'"
                "  ELSE props END AS props)"
                f" FROM {src}"
            )
        elif variant == "schemadrift":
            cols = [
                r[0]
                for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
            ]
            widen = {"l_linenumber": "BIGINT"}
            narrow = {
                "o_orderkey": "INTEGER", "o_custkey": "INTEGER",
                "c_custkey": "INTEGER", "c_nationkey": "INTEGER",
            }
            exprs = []
            for c in reversed(cols):
                if c in widen:
                    exprs.append(f"CAST({c} AS {widen[c]}) AS {c}")
                elif c in narrow:
                    exprs.append(f"CAST({c} AS {narrow[c]}) AS {c}")
                else:
                    exprs.append(c)
            sel = f"SELECT {', '.join(exprs)} FROM {src}"
        elif variant == "nullx" and t == "orders":
            sel = (
                "SELECT * REPLACE (CASE WHEN o_orderkey % 7 = 0 THEN NULL"
                f" ELSE o_custkey END AS o_custkey) FROM {src}"
            )
        elif variant == "nullx" and t == "lineitem":
            sel = (
                "SELECT * REPLACE ("
                " CASE WHEN (l_orderkey * 7 + l_linenumber) % 11 = 0 THEN NULL"
                "  ELSE l_partkey END AS l_partkey,"
                " CASE WHEN (l_orderkey * 7 + l_linenumber) % 13 = 0 THEN NULL"
                "  ELSE l_suppkey END AS l_suppkey)"
                f" FROM {src}"
            )
        elif variant == "nullx" and t == "customer":
            sel = (
                "SELECT * REPLACE (CASE WHEN c_custkey % 17 = 0 THEN NULL"
                f" ELSE c_nationkey END AS c_nationkey) FROM {src}"
            )
        elif variant == "nullx" and t == "events":
            # nullkeys slices land FIRST (%7 user_id, %23 event_type), then
            # the extremes values land on the survivors (%13 user_id longs,
            # %11 IEEE value) -- NULL keys and IEEE poison in one build
            sel = (
                "SELECT * REPLACE ("
                " CASE WHEN event_id % 7 = 0 THEN NULL"
                "  WHEN event_id % 13 = 0 THEN 9223372036854775807"
                "  WHEN event_id % 13 = 1 THEN -9223372036854775808"
                "  WHEN event_id % 13 = 2 THEN 9223372036854775806"
                "  ELSE user_id END AS user_id,"
                " CASE WHEN event_id % 23 = 0 THEN NULL"
                "  ELSE event_type END AS event_type,"
                " CASE event_id % 11"
                "  WHEN 0 THEN 'infinity'::DOUBLE"
                "  WHEN 1 THEN '-infinity'::DOUBLE"
                "  WHEN 2 THEN 'nan'::DOUBLE"
                "  WHEN 3 THEN 1e308"
                "  WHEN 4 THEN -1e308"
                "  WHEN 5 THEN 5e-324"
                "  ELSE value END AS value)"
                f" FROM {src}"
            )
        elif variant == "sfx2":
            OFF = 10_000_000
            if t in ("region", "nation"):
                sel = f"SELECT * FROM {src}"
            elif t == "customer":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT * REPLACE (c_custkey + {OFF} AS c_custkey) FROM {src}"
                )
            elif t == "supplier":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT * REPLACE (s_suppkey + {OFF} AS s_suppkey) FROM {src}"
                )
            elif t == "part":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT * REPLACE (p_partkey + {OFF} AS p_partkey) FROM {src}"
                )
            elif t == "orders":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT * REPLACE (o_orderkey + {OFF} AS o_orderkey,"
                    f" o_custkey + {OFF} AS o_custkey) FROM {src}"
                )
            elif t == "lineitem":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT * REPLACE (l_orderkey + {OFF} AS l_orderkey,"
                    f" l_partkey + {OFF} AS l_partkey,"
                    f" l_suppkey + {OFF} AS l_suppkey) FROM {src}"
                )
            elif t == "events":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT * REPLACE (event_id + {OFF} AS event_id,"
                    f" user_id + {OFF} AS user_id) FROM {src}"
                )
            elif t == "documents":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT doc_id + {OFF} AS doc_id,"
                    f" text || ' sfxtok' || doc_id::VARCHAR AS text, lang, source,"
                    f" length(text || ' sfxtok' || doc_id::VARCHAR) AS n_chars"
                    f" FROM {src}"
                )
            elif t == "embeddings":
                sel = (
                    f"SELECT * FROM {src} UNION ALL "
                    f"SELECT * REPLACE (vec_id + {OFF} AS vec_id) FROM {src}"
                )
            else:
                sel = f"SELECT * FROM {src}"
        elif variant == "tsdup" and t == "events":
            sel = (
                "SELECT * REPLACE (TIMESTAMP '2024-03-15 12:00:00' AS ts)"
                f" FROM {src}"
            )
        elif variant == "tsdup" and t == "orders":
            sel = (
                "SELECT * REPLACE (TIMESTAMP '2024-03-15 00:00:00' AS o_orderdate)"
                f" FROM {src}"
            )
        elif variant == "tsdup" and t == "lineitem":
            sel = (
                "SELECT * REPLACE (TIMESTAMP '2024-03-15 00:00:00' AS l_shipdate)"
                f" FROM {src}"
            )
        elif variant == "ctrlchars" and t == "documents":
            mut = (
                "CASE doc_id % 31"
                " WHEN 0 THEN text || ' nul' || chr(0) || 'tok'"
                " WHEN 1 THEN text || ' vt' || chr(11) || 'tok'"
                " WHEN 2 THEN text || ' ff' || chr(12) || 'tok'"
                " WHEN 3 THEN text || ' zw​tok'"
                " WHEN 4 THEN text || ' zj‍tok'"
                " WHEN 5 THEN 'ctl pair ' || (doc_id // 31)::VARCHAR"
                " WHEN 6 THEN 'ctl' || chr(11) || 'pair ' || (doc_id // 31)::VARCHAR"
                " WHEN 7 THEN text || ' nb tok'"
                " WHEN 8 THEN text || ' rt‮tok'"
                " WHEN 9 THEN '﻿' || text"
                " WHEN 10 THEN text || ' cómbtok'"
                " ELSE text END"
            )
            # the vtab twins share ONE source so the d01/q48 per-source
            # distinct-fingerprint aggregates actually observe the
            # divergence (first build left them in different source
            # groups and the trap never sprang -- the direct probe did)
            srccol = (
                "CASE WHEN doc_id % 31 IN (5, 6) THEN 'ctlsrc' ELSE source END"
            )
            sel = (
                f"SELECT doc_id, {mut} AS text, lang, {srccol} AS source,"
                f" length({mut}) AS n_chars FROM {src}"
            )
        elif variant == "unicode" and t == "documents":
            toks = ", ".join(f"'{x}'" for x in UNI_TOKENS)
            sel = (
                "SELECT doc_id, "
                f" concat(replace(text, 'a', 'á'), ' ', ([{toks}])[(doc_id % 8 + 1)::INT]) AS text,"
                " lang, source,"
                f" length(concat(replace(text, 'a', 'á'), ' ', ([{toks}])[(doc_id % 8 + 1)::INT])) AS n_chars"
                f" FROM {src}"
            )
        elif variant == "unicode" and t == "part":
            sel = f"SELECT * REPLACE (replace(p_name, 'a', 'ä') AS p_name) FROM {src}"
        elif variant == "unicode" and t == "events":
            sel = (
                "SELECT * REPLACE (CASE WHEN event_id % 5 = 0"
                " THEN event_type || '·中' ELSE event_type END AS event_type)"
                f" FROM {src}"
            )
        else:
            sel = f"SELECT * FROM {src}"
        con.execute(f"COPY ({sel}) TO '{out_dir}/{t}.parquet' (FORMAT parquet)")
        if variant == "rowgroup":
            # DuckDB clamps ROW_GROUP_SIZE to vector multiples (2048), so
            # the degenerate shred goes through pyarrow: identical bytes,
            # 64-row groups (thousands of groups per file at test SFs).
            import pyarrow.parquet as pq

            path = f"{out_dir}/{t}.parquet"
            pq.write_table(pq.read_table(path), path, row_group_size=64)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["nulls", "singlerow", "unicode", "salt", "ties",
                             "empty", "bigmoney", "extremes", "dupx", "longstr",
                             "timex", "skew", "nullkeys", "jsonx", "schemadrift",
                             "nullx", "sfx2", "rowgroup", "tsdup", "ctrlchars"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--dup-factor", type=int, default=100)
    args = ap.parse_args()
    print(build(args.variant, args.sf_dir, args.out_dir, dup_factor=args.dup_factor))


if __name__ == "__main__":
    main()
