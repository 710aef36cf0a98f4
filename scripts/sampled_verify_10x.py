#!/usr/bin/env python
"""Sampled-closure 10x verification for the oracle-intractable queries
(round-11, verdict item 3).

Six registry queries could never get a full-battery DuckDB row at 10x:
the four transitive-closure queries (``dedup_dup_groups``,
``dedup_keep_best``, ``split_leakage_safe``, ``split_leakage_probe``)
because the recursive ``reach`` CTE is quadratic in component size
(31M-pair graph -> >100GB), and the two bucketed-pair queries
(``dedup_lsh_recall_report``, ``embedding_near_dup``) because the
candidate x shingle / bucket-pair x vector joins explode. This script
replaces "excluded" with a DECOMPOSED exact check whose only sampled
step is the one that is genuinely size-unbounded:

Closure family (shared SimHash pair graph -> connected components):
  I1 (FULL)   every pair edge connects same-component ids -> engine
              components are closed under adjacency (no under-merge
              anywhere, proven for the whole graph);
  I2 (FULL)   every component label equals min(member id);
  I3 (FULL)   the component map is a partition of exactly the pair
              graph's node set;
  C  (SAMPLE) for N sampled components (the largest + hash-picked),
              DuckDB re-closes the component's induced subgraph by
              min-label propagation TO FIXPOINT (loop until 0 labels
              change — correctness comes from the verified fixpoint,
              not from trusting an iteration count); exactly one label
              at fixpoint <=> the engine component is one true
              component (no over-merge among sampled components);
  D  (FULL)   each query's full output re-derived in DuckDB FROM the
              exported component map (group summary / quality-argmax
              survivors / leakage-safe split / leakage probe) and
              hash-compared against the registered Spark query's
              output — everything downstream of the closure is checked
              exactly, conditioned on the map that A-C just verified.

dedup_lsh_recall_report:
  FULL   candidate-pair SET equality (DuckDB band join vs the engine's
         exported candidates, anti-joined both directions) and the
         report's n_candidates consistency;
  SAMPLE exact 3-gram Jaccard recomputed in DuckDB for M hash-sampled
         candidate+planted pairs vs the engine's per-pair values (the
         all-candidate shingle-intersection join is the part that
         explodes; per-pair it is bounded by 2 documents' shingles).

embedding_near_dup:
  FULL   soundness of every output pair: exact cosine recomputed in
         DuckDB (must round to the engine's value and pass the 0.95
         threshold) + SRP-bucket agreement of the pair;
  SAMPLE completeness per bucket: for K sampled SRP buckets (largest +
         hash-picked, capped by pair count), DuckDB enumerates ALL
         in-bucket pairs and every >=0.95 pair must appear in the
         engine output.

Writes a SCALE_SAMPLED artifact with per-query {sampled, sample_spec,
checks, pass, seconds}.

Usage: python scripts/sampled_verify_10x.py [fixture_dir] [out.json]
       (defaults /tmp/sfscale10 SCALE_SAMPLED_r11.json)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import duckdb  # noqa: E402

from check_oracle import table_hash  # noqa: E402
from pg2any_spark.operators import dedup as D  # noqa: E402
from pg2any_spark.plans import queries_ml as QM  # noqa: E402
from pg2any_spark.plans.queries import QUERIES  # noqa: E402
from pg2any_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

FX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfscale10"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/SCALE_SAMPLED_r11.json"
SCRATCH = "/tmp/sampled10x"
N_COMP_SAMPLES = 25
N_PAIR_SAMPLES = 200
N_BUCKET_SAMPLES = 12
BUCKET_PAIR_CAP = 5_000_000  # exact-cosine pairs per sampled bucket

report: dict[str, dict] = {}


def record(name: str, t0: float, checks: dict, spec: str) -> None:
    ok = all(bool(v) for v in checks.values())
    report[name] = {
        "sampled": True,
        "sample_spec": spec,
        "checks": checks,
        "pass": ok,
        "seconds": round(time.time() - t0, 1),
    }
    mark = "PASS" if ok else "FAIL"
    print(f"== {name}: {mark} {json.dumps(checks)[:400]}")


def spark_vs_duck(sdf, duck_rows, duck_cols) -> dict:
    srows = sdf.collect()
    same_cols = sorted(sdf.columns) == sorted(duck_cols)
    return {
        "rows_equal": len(srows) == len(duck_rows),
        "cols_equal": same_cols,
        "hash_equal": same_cols
        and table_hash(srows, sdf.columns) == table_hash(duck_rows, duck_cols),
    }


def main() -> None:
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark(app_name="sampled-verify-10x")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '48GB')}'"
    )
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{FX}/{t}.parquet')"
        )

    # ---------------- closure family ----------------
    t0 = time.time()
    corpus = QM._mutated_corpus(spark, FX)
    fps = D.simhash(corpus, "id", "text", bits=32)
    pairs = D.simhash_hamming_pairs(fps, "id", max_distance=3).select(
        "id_a", "id_b"
    )
    pairs.write.mode("overwrite").parquet(f"{SCRATCH}/pairs")
    pairs = spark.read.parquet(f"{SCRATCH}/pairs")
    comp = D.connected_components(pairs)
    comp.write.mode("overwrite").parquet(f"{SCRATCH}/comp")
    con.execute(
        f"CREATE VIEW pairs AS SELECT * FROM read_parquet('{SCRATCH}/pairs/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW comp AS SELECT * FROM read_parquet('{SCRATCH}/comp/*.parquet')"
    )
    n_pairs, n_nodes = con.execute(
        "SELECT (SELECT COUNT(*) FROM pairs), (SELECT COUNT(*) FROM comp)"
    ).fetchone()
    print(f"# pair graph: {n_pairs} edges, {n_nodes} nodes "
          f"[{time.time() - t0:.0f}s build]")

    closure_checks: dict[str, bool | int] = {}
    # I1: no edge straddles two components (=> no under-merge anywhere)
    closure_checks["i1_edge_closure_violations_0"] = (
        con.execute(
            """SELECT COUNT(*) FROM pairs p
               LEFT JOIN comp a ON a.id = p.id_a
               LEFT JOIN comp b ON b.id = p.id_b
               WHERE a.component IS NULL OR b.component IS NULL
                  OR a.component <> b.component"""
        ).fetchone()[0]
        == 0
    )
    # I2: labels canonical (= min member id)
    closure_checks["i2_min_label_violations_0"] = (
        con.execute(
            """SELECT COUNT(*) FROM (
                 SELECT component, MIN(id) AS m FROM comp GROUP BY component
               ) WHERE m <> component"""
        ).fetchone()[0]
        == 0
    )
    # I3: comp is a partition of exactly the pair graph's node set
    closure_checks["i3_partition_ok"] = (
        con.execute(
            """SELECT (SELECT COUNT(*) FROM comp) =
                      (SELECT COUNT(DISTINCT id) FROM comp)
                  AND (SELECT COUNT(*) FROM comp) =
                      (SELECT COUNT(*) FROM (
                         SELECT id_a AS id FROM pairs
                         UNION SELECT id_b FROM pairs))
                  AND NOT EXISTS (
                      SELECT 1 FROM (SELECT id_a AS id FROM pairs
                                     UNION SELECT id_b FROM pairs) n
                      LEFT JOIN comp c ON c.id = n.id
                      WHERE c.id IS NULL)"""
        ).fetchone()[0]
    )

    # C: sampled components re-closed to fixpoint in DuckDB
    top = [
        r[0]
        for r in con.execute(
            """SELECT component FROM (
                 SELECT component, COUNT(*) c FROM comp GROUP BY component)
               ORDER BY c DESC, component LIMIT 2"""
        ).fetchall()
    ]
    picked = [
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT component FROM comp
                WHERE component NOT IN ({",".join(map(str, top))})
                ORDER BY md5(CAST(component AS VARCHAR))
                LIMIT {N_COMP_SAMPLES - len(top)}"""
        ).fetchall()
    ]
    samples = top + picked
    over_merged = []
    sampled_nodes = 0
    for comp_id in samples:
        con.execute("DROP TABLE IF EXISTS sub_edges")
        con.execute("DROP TABLE IF EXISTS lbl")
        con.execute(
            f"""CREATE TEMP TABLE sub_edges AS
                SELECT p.id_a, p.id_b FROM pairs p
                JOIN comp c ON c.id = p.id_a
                WHERE c.component = {comp_id}"""
        )
        con.execute(
            f"""CREATE TEMP TABLE lbl AS
                SELECT id, id AS lbl FROM comp WHERE component = {comp_id}"""
        )
        while True:
            con.execute(
                """CREATE OR REPLACE TEMP TABLE nl AS
                   SELECT id, MIN(l) AS lbl FROM (
                     SELECT id, lbl AS l FROM lbl
                     UNION ALL
                     SELECT e.id_a, l.lbl FROM sub_edges e
                       JOIN lbl l ON l.id = e.id_b
                     UNION ALL
                     SELECT e.id_b, l.lbl FROM sub_edges e
                       JOIN lbl l ON l.id = e.id_a
                   ) GROUP BY id"""
            )
            changed = con.execute(
                """SELECT COUNT(*) FROM nl JOIN lbl USING (id)
                   WHERE nl.lbl <> lbl.lbl"""
            ).fetchone()[0]
            con.execute("CREATE OR REPLACE TEMP TABLE lbl AS SELECT * FROM nl")
            if changed == 0:
                break
        n_labels, n_members = con.execute(
            "SELECT COUNT(DISTINCT lbl), COUNT(*) FROM lbl"
        ).fetchone()
        sampled_nodes += n_members
        if n_labels != 1:
            over_merged.append(int(comp_id))
    closure_checks["c_sampled_components_single_label"] = not over_merged
    closure_checks["c_sampled_component_count"] = len(samples)
    closure_checks["c_sampled_member_count"] = sampled_nodes
    if over_merged:
        closure_checks["c_over_merged_labels"] = over_merged  # type: ignore[assignment]
    spec_closure = (
        f"components: 2 largest + {len(picked)} by md5(component); "
        "closure = DuckDB min-label propagation to verified fixpoint; "
        "I1-I3 are full-graph"
    )

    # D: full downstream outputs, conditioned on the verified comp map
    mc = QM._MUTATED_CORPUS
    duck_sql = {
        "dedup_dup_groups": """
            SELECT component AS group_id, COUNT(*) AS group_size,
                   MAX(id) AS max_member_id
            FROM comp GROUP BY component ORDER BY group_id""",
        "dedup_keep_best": f"""
            WITH corpus AS ({mc}),
            q AS (SELECT id, {QM._QUALITY_EXPR} AS quality FROM corpus),
            g AS (SELECT q.id, COALESCE(c.component, q.id) AS group_id,
                         q.quality
                  FROM q LEFT JOIN comp c ON c.id = q.id)
            SELECT id, group_id, quality,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY group_id
                       ORDER BY quality DESC, id) = 1 AS INT) AS keep
            FROM g""",
        "split_leakage_safe": f"""
            WITH corpus AS ({mc}),
            rep AS (SELECT c.id, COALESCE(cm.component, c.id) AS rep
                    FROM corpus c LEFT JOIN comp cm ON cm.id = c.id),
            spl AS (SELECT id, rep,
                           CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)
                                || 'lsplit'), 1, 8)) AS BIGINT)
                               % 1000000 AS b
                    FROM rep)
            SELECT CASE WHEN b < 10000 THEN 'eval'
                        WHEN b < 20000 THEN 'test'
                        ELSE 'train' END AS split,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_split_keys
            FROM spl GROUP BY 1 ORDER BY split""",
        "split_leakage_probe": f"""
            WITH corpus AS ({mc}),
            rep AS (SELECT c.id, COALESCE(cm.component, c.id) AS rep
                    FROM corpus c LEFT JOIN comp cm ON cm.id = c.id),
            spl AS (
                SELECT id,
                       CASE WHEN CAST(('0x' || substr(md5(CAST(id AS VARCHAR)
                                || 'lsplit'), 1, 8)) AS BIGINT)
                                % 1000000 < 100000 THEN 'eval'
                            WHEN CAST(('0x' || substr(md5(CAST(id AS VARCHAR)
                                || 'lsplit'), 1, 8)) AS BIGINT)
                                % 1000000 < 200000 THEN 'test'
                            ELSE 'train' END AS s_naive,
                       CASE WHEN CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)
                                || 'lsplit'), 1, 8)) AS BIGINT)
                                % 1000000 < 100000 THEN 'eval'
                            WHEN CAST(('0x' || substr(md5(CAST(rep AS VARCHAR)
                                || 'lsplit'), 1, 8)) AS BIGINT)
                                % 1000000 < 200000 THEN 'test'
                            ELSE 'train' END AS s_grouped
                FROM rep)
            SELECT CAST(SUM(CASE WHEN a.s_naive <> b.s_naive
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS leak_pairs_naive,
                   CAST(SUM(CASE WHEN a.s_grouped <> b.s_grouped
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS leak_pairs_grouped,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST((SELECT COUNT(DISTINCT component) FROM comp)
                        AS BIGINT) AS n_dup_groups
            FROM pairs p
            JOIN spl a ON a.id = p.id_a
            JOIN spl b ON b.id = p.id_b""",
    }
    for qname, sql in duck_sql.items():
        tq = time.time()
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        checks = dict(closure_checks)
        checks.update(
            {f"d_{k}": v
             for k, v in spark_vs_duck(QUERIES[qname](spark, FX), drows,
                                       dcols).items()}
        )
        record(qname, tq, checks, spec_closure)

    # ---------------- dedup_lsh_recall_report ----------------
    t0 = time.time()
    cand = D.lsh_candidate_pairs(corpus, "id", "text", num_hashes=12, bands=4)
    cand.select("id_a", "id_b").write.mode("overwrite").parquet(
        f"{SCRATCH}/cand"
    )
    con.execute(
        f"CREATE VIEW spark_cand AS "
        f"SELECT * FROM read_parquet('{SCRATCH}/cand/*.parquet')"
    )
    cand_ctes = f"""
    WITH corpus AS ({mc}),
    sh AS (SELECT id, unnest({QM._SHINGLE_SQL}) AS shingle FROM corpus),
    hashed AS (
        SELECT id,
               CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) AS h1,
               CAST(('0x' || substr(md5(shingle), 9, 8)) AS BIGINT) AS h2
        FROM sh
    ),
    sig AS (SELECT id, {QM._minhash_sig_sql(12)} FROM hashed GROUP BY id),
    bands AS ({QM._band_sql(4, 3)}),
    duck_cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.id < b.id
    )"""
    missing, extra = con.execute(
        cand_ctes
        + """
        SELECT (SELECT COUNT(*) FROM duck_cand d
                LEFT JOIN spark_cand s
                  ON s.id_a = d.id_a AND s.id_b = d.id_b
                WHERE s.id_a IS NULL),
               (SELECT COUNT(*) FROM spark_cand s
                LEFT JOIN duck_cand d
                  ON d.id_a = s.id_a AND d.id_b = s.id_b
                WHERE d.id_a IS NULL)"""
    ).fetchone()
    n_cand = con.execute("SELECT COUNT(*) FROM spark_cand").fetchone()[0]
    rep_row = QUERIES["dedup_lsh_recall_report"](spark, FX).collect()[0]
    sample_pairs = con.execute(
        """SELECT id_a, id_b FROM (
             SELECT id_a, id_b FROM spark_cand
             UNION
             SELECT doc_id, doc_id + 100000 FROM documents)
           ORDER BY md5(CAST(id_a AS VARCHAR) || '_'
                        || CAST(id_b AS VARCHAR))
           LIMIT ?""",
        [N_PAIR_SAMPLES],
    ).fetchall()
    vals = ",".join(f"({a},{b})" for a, b in sample_pairs)
    duck_jac = dict(
        (
            ((r[0], r[1]), r[2])
            for r in con.execute(
                f"""WITH corpus AS ({mc}),
                sample(id_a, id_b) AS (VALUES {vals}),
                ids AS (SELECT id_a AS id FROM sample
                        UNION SELECT id_b FROM sample),
                sh AS (SELECT id, unnest({QM._SHINGLE_SQL}) AS shingle
                       FROM corpus WHERE id IN (SELECT id FROM ids)),
                dsh AS (SELECT DISTINCT id, shingle FROM sh),
                sizes AS (SELECT id, COUNT(*) AS set_size FROM dsh
                          GROUP BY id),
                inter AS (
                    SELECT p.id_a, p.id_b, COUNT(*) AS n_inter
                    FROM sample p
                    JOIN dsh a ON a.id = p.id_a
                    JOIN dsh b ON b.id = p.id_b AND b.shingle = a.shingle
                    GROUP BY p.id_a, p.id_b)
                SELECT p.id_a, p.id_b,
                       ROUND(COALESCE(i.n_inter, 0)
                             / (sa.set_size + sb.set_size
                                - COALESCE(i.n_inter, 0)), 6)
                FROM sample p
                LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
                JOIN sizes sa ON sa.id = p.id_a
                JOIN sizes sb ON sb.id = p.id_b"""
            ).fetchall()
        )
    )
    sp_df = spark.createDataFrame(sample_pairs, "id_a long, id_b long")
    sjac = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard(corpus, sp_df, "id", "text", n=3).collect()
    }
    jac_bad = [
        k
        for k in duck_jac
        if k not in sjac or abs(float(sjac[k]) - float(duck_jac[k])) > 1e-6
    ]
    checks = {
        "full_cand_set_missing_in_spark_0": missing == 0,
        "full_cand_set_extra_in_spark_0": extra == 0,
        "report_n_candidates_consistent": rep_row.n_candidates == n_cand,
        "sampled_jaccard_pairs": len(sample_pairs),
        "sampled_jaccard_mismatches_0": not jac_bad,
    }
    record(
        "dedup_lsh_recall_report",
        t0,
        checks,
        f"candidate set compared in FULL; jaccard verified on "
        f"{len(sample_pairs)} md5-ordered candidate+planted pairs",
    )

    # ---------------- embedding_near_dup ----------------
    t0 = time.time()
    QUERIES["embedding_near_dup"](spark, FX).write.mode("overwrite").parquet(
        f"{SCRATCH}/nd"
    )
    con.execute(
        f"CREATE VIEW nd AS SELECT * FROM read_parquet('{SCRATCH}/nd/*.parquet')"
    )
    nd_ctes = f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 100000,
               list_transform(embedding::DOUBLE[], x -> x * 0.5)
        FROM embeddings
    ),
    planes AS ({QM._srp_planes_sql(8)}),
    buckets AS (
        SELECT pr.vec_id,
               SUM(CASE WHEN pr.proj > 0
                        THEN CAST(pow(2, pr.p) AS BIGINT) ELSE 0 END)
                   AS bucket
        FROM (SELECT b2.vec_id, pl.p, SUM(b2.v[pl.d + 1] * pl.sign) AS proj
              FROM base b2, planes pl
              GROUP BY b2.vec_id, pl.p) pr
        GROUP BY pr.vec_id
    )"""
    con.execute(
        "CREATE TEMP TABLE bkt AS " + nd_ctes + " SELECT * FROM buckets"
    )
    con.execute(
        """CREATE TEMP TABLE basev AS
           SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 100000,
                  list_transform(embedding::DOUBLE[], x -> x * 0.5)
           FROM embeddings"""
    )
    unsound, n_out = con.execute(
        """SELECT COUNT(*) FILTER (
                 WHERE ROUND(list_cosine_similarity(va.v, vb.v), 6)
                           <> n.cos_sim
                    OR n.cos_sim < 0.95
                    OR ba.bucket <> bb.bucket),
               COUNT(*)
           FROM nd n
           JOIN basev va ON va.vec_id = n.id_a
           JOIN basev vb ON vb.vec_id = n.id_b
           JOIN bkt ba ON ba.vec_id = n.id_a
           JOIN bkt bb ON bb.vec_id = n.id_b"""
    ).fetchone()
    joined = con.execute("""
        SELECT COUNT(*) FROM nd n
        JOIN basev va ON va.vec_id = n.id_a
        JOIN basev vb ON vb.vec_id = n.id_b""").fetchone()[0]
    bucket_sizes = con.execute(
        """SELECT bucket, COUNT(*) c FROM bkt GROUP BY bucket
           ORDER BY c DESC, bucket"""
    ).fetchall()
    chosen, skipped = [], []
    for bkt_id, c in bucket_sizes[:2]:
        if c * (c - 1) // 2 <= BUCKET_PAIR_CAP:
            chosen.append(int(bkt_id))
        else:
            skipped.append({"bucket": int(bkt_id), "pairs": c * (c - 1) // 2})
    hash_picked = con.execute(
        f"""SELECT bucket FROM (SELECT bucket, COUNT(*) c FROM bkt
             GROUP BY bucket)
            WHERE c * (c - 1) / 2 <= {BUCKET_PAIR_CAP}
              AND bucket NOT IN ({",".join(map(str, chosen)) or "-1"})
            ORDER BY md5(CAST(bucket AS VARCHAR))
            LIMIT {N_BUCKET_SAMPLES - len(chosen)}"""
    ).fetchall()
    chosen += [int(r[0]) for r in hash_picked]
    in_list = ",".join(map(str, chosen))
    missing_nd = con.execute(
        f"""WITH inb AS (SELECT vec_id, bucket FROM bkt
                         WHERE bucket IN ({in_list})),
        full_pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM inb a JOIN inb b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        ),
        qual AS (
            SELECT p.id_a, p.id_b
            FROM full_pairs p
            JOIN basev va ON va.vec_id = p.id_a
            JOIN basev vb ON vb.vec_id = p.id_b
            WHERE ROUND(list_cosine_similarity(va.v, vb.v), 6) >= 0.95
        )
        SELECT COUNT(*) FROM qual q
        LEFT JOIN nd n ON n.id_a = q.id_a AND n.id_b = q.id_b
        WHERE n.id_a IS NULL"""
    ).fetchone()[0]
    checks = {
        "full_soundness_violations_0": unsound == 0,
        "full_output_rows": n_out,
        "full_output_all_joinable": joined == n_out,
        "sampled_buckets": len(chosen),
        "sampled_completeness_missing_0": missing_nd == 0,
    }
    if skipped:
        checks["skipped_over_cap_buckets"] = skipped  # type: ignore[assignment]
    record(
        "embedding_near_dup",
        t0,
        checks,
        f"soundness FULL over all {n_out} output pairs; completeness over "
        f"{len(chosen)} sampled SRP buckets (largest first, "
        f"pair cap {BUCKET_PAIR_CAP})",
    )

    out = {
        "fixture": FX,
        "method": "sampled-closure / decomposed-exact verification "
                  "(round-11 verdict item 3)",
        "results": report,
        "n_pass": sum(1 for r in report.values() if r["pass"]),
        "n_total": len(report),
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{OUT}: {out['n_pass']}/{out['n_total']} pass")
    if out["n_pass"] != out["n_total"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
