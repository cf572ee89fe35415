#!/usr/bin/env python3
"""Chunked DuckDB oracle replay for the pairs family at sf10-scale.

The monolithic mirrors (check_oracle.py) replay each query as ONE SQL
statement; for the all-pairs-style pair queries at 500k docs the join
intermediate exceeds the box's spill disk (observed: >65 GB for
p23_increment's shingle equi-join at sf10h) even though the OUTPUT is
bounded. This runner verifies the same results per-batch (r10 verdict
item 3): the LEFT pair key is split into K residue classes, each chunk
replays the join for its class only, and the chunk union IS the
unchunked result because every per-pair / per-incoming-doc computation
(group counts, per-id_in rank/count, thresholds) is a function of rows
that share the chunk key. Shared linear-size relations (shingle sets,
sizes, LSH candidates) are materialized ONCE as temp tables so the
window-function CTEs don't re-run K times.

The SQL bodies are copied verbatim from the dumped oracle_sql.json
expressions (same rounding, same thresholds) — only the chunk
predicate and the temp-table factoring differ.

Usage:
  python3 tools/chunked_oracle.py <sfDir> <verifyOutDir> [options]
    --only a,b,c   queries to check (default: all supported)
    --k N          chunk count (default 8)
    --mem LIMIT    duckdb memory_limit (default 24GB)
    --json PATH    merge {name: status} into PATH
"""
import sys, os, json, glob, importlib.util

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "check_oracle", os.path.join(_here, "check_oracle.py"))
co = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(co)

# shared shingle/bigram temp tables (verbatim from the oracle CTEs)
TOKS = """CREATE TEMP TABLE t_toks AS
  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents"""

BIG = """CREATE TEMP TABLE t_big AS
  SELECT DISTINCT doc_id,
         token || ' ' || lead(token, 1)
           OVER (PARTITION BY doc_id ORDER BY pos) AS bg
  FROM t_toks QUALIFY bg IS NOT NULL"""

SH3 = """CREATE TEMP TABLE t_sh AS
  SELECT DISTINCT doc_id,
         token || ' ' || lead(token, 1) OVER w || ' ' ||
         lead(token, 2) OVER w AS shingle
  FROM t_toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(token, 2) OVER w IS NOT NULL"""

SID = """CREATE TEMP TABLE t_sid AS
  SELECT DISTINCT doc_id,
         CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS vid
  FROM t_sh"""

# p23/s4: xxhash64-vid shingles (IncrementOracle's ShinglesCte uses the
# engine-side hash domain via the plain shingle string join; its sh CTE
# is the 3-gram one and vid identity is the shingle itself)
def setup_for(name):
    if name in ("p4_jaccard",):
        return [TOKS, BIG,
                "CREATE TEMP TABLE t_sizes AS "
                "SELECT doc_id, COUNT(*) AS n FROM t_big GROUP BY doc_id"]
    if name in ("p14_sparsecos",):
        # tf/n2 are linear-size; the quadratic token equi-join lives in
        # the chunked body
        return [TOKS,
                "CREATE TEMP TABLE t_tf AS "
                "SELECT doc_id, token, COUNT(*) AS tf "
                "FROM t_toks GROUP BY doc_id, token",
                "CREATE TEMP TABLE t_n2 AS "
                "SELECT doc_id, CAST(SUM(tf*tf) AS BIGINT) AS n2 "
                "FROM t_tf GROUP BY doc_id"]
    if name in ("p13_annkmeans",):
        # the Lloyd chain (K=8 centroids, 2 refinement passes) is
        # LINEAR in N and runs once; materializing t_u/t_pr as real
        # tables also stops DuckDB from re-materializing the
        # multiply-referenced CTEs (the monolithic form's disk blowup).
        # The quadratic part — probes x same-cell neighbors x 64-dim
        # dots — is the chunked body.
        return ["""CREATE TEMP TABLE t_u AS
  WITH ex AS (
    SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
           generate_subscripts(embedding, 1) AS d
    FROM embeddings),
  n0 AS (SELECT vec_id, sqrt(SUM(x*x)) AS nrm FROM ex GROUP BY vec_id)
  SELECT e.vec_id, e.d, e.x / n.nrm AS x
  FROM ex e JOIN n0 n USING (vec_id)""",
                """CREATE TEMP TABLE t_pr AS
  WITH c0 AS (SELECT vec_id AS c_id, d, x FROM t_u WHERE vec_id < 8),
  s1 AS (
    SELECT u.vec_id, c.c_id, SUM(u.x*c.x) AS sim
    FROM t_u u JOIN c0 c ON u.d = c.d GROUP BY u.vec_id, c.c_id),
  a1 AS (
    SELECT vec_id, c_id FROM (
      SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id
        ORDER BY ROUND(sim, 6) DESC, c_id) AS rn FROM s1) t
    WHERE rn = 1),
  m1 AS (
    SELECT a.c_id, u.d,
           CAST(SUM(CAST(u.x AS DECIMAL(24,18))) AS DOUBLE)/COUNT(*) AS m
    FROM a1 a JOIN t_u u ON u.vec_id = a.vec_id GROUP BY a.c_id, u.d),
  n1 AS (
    SELECT c_id,
           sqrt(CAST(SUM(CAST(m*m AS DECIMAL(30,20))) AS DOUBLE)) AS nrm
    FROM m1 GROUP BY c_id),
  c1 AS (
    SELECT m.c_id, m.d, m.m/n.nrm AS x
    FROM m1 m JOIN n1 n USING (c_id) WHERE n.nrm > 0
    UNION ALL
    SELECT p.c_id, p.d, p.x FROM c0 p
    WHERE p.c_id NOT IN (SELECT c_id FROM n1 WHERE nrm > 0)),
  s2 AS (
    SELECT u.vec_id, c.c_id, SUM(u.x*c.x) AS sim
    FROM t_u u JOIN c1 c ON u.d = c.d GROUP BY u.vec_id, c.c_id),
  a2 AS (
    SELECT vec_id, c_id FROM (
      SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id
        ORDER BY ROUND(sim, 6) DESC, c_id) AS rn FROM s2) t
    WHERE rn = 1),
  m2 AS (
    SELECT a.c_id, u.d,
           CAST(SUM(CAST(u.x AS DECIMAL(24,18))) AS DOUBLE)/COUNT(*) AS m
    FROM a2 a JOIN t_u u ON u.vec_id = a.vec_id GROUP BY a.c_id, u.d),
  n2x AS (
    SELECT c_id,
           sqrt(CAST(SUM(CAST(m*m AS DECIMAL(30,20))) AS DOUBLE)) AS nrm
    FROM m2 GROUP BY c_id),
  c2 AS (
    SELECT m.c_id, m.d, m.m/n.nrm AS x
    FROM m2 m JOIN n2x n USING (c_id) WHERE n.nrm > 0
    UNION ALL
    SELECT p.c_id, p.d, p.x FROM c1 p
    WHERE p.c_id NOT IN (SELECT c_id FROM n2x WHERE nrm > 0)),
  cs AS (
    SELECT u.vec_id, c.c_id, SUM(u.x*c.x) AS sim
    FROM t_u u JOIN c2 c ON u.d = c.d GROUP BY u.vec_id, c.c_id)
  SELECT vec_id, c_id, row_number() OVER (PARTITION BY vec_id
    ORDER BY ROUND(sim, 6) DESC, c_id) AS crn FROM cs""",
                "CREATE TEMP TABLE t_assign AS "
                "SELECT vec_id, c_id AS cell FROM t_pr WHERE crn = 1",
                "CREATE TEMP TABLE t_probes AS "
                "SELECT vec_id, c_id AS cell FROM t_pr "
                "WHERE crn <= 2 AND vec_id < 2000"]
    if name in ("p45_containment",):
        return [TOKS, SH3, SID,
                "CREATE TEMP TABLE t_sizes AS "
                "SELECT doc_id, COUNT(*) AS n FROM t_sid GROUP BY doc_id"]
    if name in ("p10_lshdedup",):
        return [TOKS, SH3,
                "CREATE TEMP TABLE t_sizes AS "
                "SELECT doc_id, COUNT(*) AS n FROM t_sh GROUP BY doc_id"]
    if name in EDGE_FINAL:
        # the edge-consumer family shares p10's shingle/sizes frames,
        # plus the empty edge table the chunk loop fills
        return [TOKS, SH3,
                "CREATE TEMP TABLE t_sizes AS "
                "SELECT doc_id, COUNT(*) AS n FROM t_sh GROUP BY doc_id"
                ] + EDGE_SETUP
    if name in ("p23_increment", "s4_streamincrement"):
        return [TOKS, SH3,
                "CREATE TEMP TABLE t_shx AS "
                "SELECT DISTINCT doc_id, shingle FROM t_sh",
                "CREATE TEMP TABLE t_sizes AS "
                "SELECT doc_id, COUNT(*) AS n FROM t_shx GROUP BY doc_id"]
    if name in ("p8_annlsh",):
        return ["""CREATE TEMP TABLE t_bk AS
  WITH ex AS (
    SELECT vec_id, unnest(embedding) AS x,
           generate_subscripts(embedding, 1) AS d
    FROM embeddings),
  dots AS (
    SELECT vec_id, j,
           ROUND(SUM((CAST((1103515245*(j*64+d)+12345) % 2048 AS DOUBLE)/2048.0
                      - 0.5) * CAST(x AS DOUBLE)), 6) AS dotp
    FROM ex CROSS JOIN range(62) t(j)
    WHERE j < (SELECT GREATEST(4, CAST(CEIL(LOG2(
                 CAST(COUNT(*) AS DOUBLE) / 128.0)) AS INT))
               FROM embeddings)
    GROUP BY vec_id, j)
  SELECT vec_id,
         CAST(SUM(CASE WHEN dotp > 0
                       THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                       ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id"""]
    if name in ("p60_lshrecall",):
        return [TOKS, SH3, SID,
                "CREATE TEMP TABLE t_sizes AS "
                "SELECT doc_id, COUNT(*) AS n FROM t_sh GROUP BY doc_id",
                """CREATE TEMP TABLE t_cands AS
  WITH sigs AS (
    SELECT doc_id, j,
           MIN(CAST(((2*j+3)::HUGEINT * (vid % 2305843009213693951)
                     + (5*j+7)) % 2305843009213693951 AS BIGINT)) AS mh
    FROM t_sid CROSS JOIN range(16) t(j) GROUP BY doc_id, j),
  bands AS (
    SELECT doc_id, j // 4 AS band,
           string_agg(CAST(mh AS VARCHAR), '-' ORDER BY j) AS key
    FROM sigs GROUP BY doc_id, j // 4)
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"""]
    raise KeyError(name)


def chunk_sql(name, k, K):
    if name == "p14_sparsecos":
        # per-chunk top-50; the global top-50 is re-ranked in pandas
        return f"""WITH inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(a.tf*b.tf) AS BIGINT) AS i
  FROM t_tf a JOIN t_tf b ON a.token = b.token AND a.doc_id < b.doc_id
  WHERE a.doc_id % {K} = {k}
  GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) /
             sqrt(CAST(na.n2 AS DOUBLE) * nb.n2) * 1e6) / 1e6 AS cosine
FROM inter
 JOIN t_n2 na ON na.doc_id = id_a
 JOIN t_n2 nb ON nb.doc_id = id_b
ORDER BY cosine DESC, id_a, id_b LIMIT 50"""
    if name == "p13_annkmeans":
        # per-query top-3: every row of a query_id lives in its chunk
        return f"""WITH scored AS (
  SELECT kq.vec_id AS query_id, kn.vec_id AS neighbor_id, kq.cell,
         ROUND(SUM(a.x*b.x), 6) AS sim
  FROM t_probes kq
   JOIN t_assign kn ON kq.cell = kn.cell AND kq.vec_id <> kn.vec_id
   JOIN t_u a ON a.vec_id = kq.vec_id
   JOIN t_u b ON b.vec_id = kn.vec_id AND b.d = a.d
  WHERE kq.vec_id % {K} = {k}
  GROUP BY kq.vec_id, kn.vec_id, kq.cell)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
         ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
       neighbor_id, sim, cell
FROM scored QUALIFY rnk <= 3"""
    if name == "p4_jaccard":
        # per-chunk top-50; the global top-50 is re-ranked in pandas
        return f"""WITH inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM t_big a JOIN t_big b ON a.bg = b.bg AND a.doc_id < b.doc_id
  WHERE a.doc_id % {K} = {k}
  GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 1e6) / 1e6 AS jaccard
FROM inter
 JOIN t_sizes sa ON sa.doc_id = id_a
 JOIN t_sizes sb ON sb.doc_id = id_b
ORDER BY jaccard DESC, id_a, id_b LIMIT 50"""
    if name == "p45_containment":
        return f"""WITH inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM t_sid a JOIN t_sid b
    ON a.vid = b.vid AND a.doc_id <> b.doc_id
  WHERE a.doc_id % {K} = {k}
  GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / sa.n * 1e6) / 1e6 AS containment
FROM inter JOIN t_sizes sa ON sa.doc_id = id_a
WHERE i * 10 >= sa.n * 8"""
    if name == "p10_lshdedup":
        return f"""WITH inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM t_sh a JOIN t_sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.doc_id % {K} = {k}
  GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 1e6) / 1e6 AS jaccard
FROM inter
 JOIN t_sizes sa ON sa.doc_id = id_a
 JOIN t_sizes sb ON sb.doc_id = id_b
WHERE i * 17 >= (sa.n + sb.n) * 7"""
    if name in ("p23_increment", "s4_streamincrement"):
        # incoming (odd) docs chunked: all of one id_in's matches,
        # counts and best-witness rank stay inside its chunk
        return f"""WITH inter AS (
  SELECT b.doc_id AS id_in, a.doc_id AS id_ex, COUNT(*) AS i
  FROM t_shx a JOIN t_shx b ON a.shingle = b.shingle
  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
    AND (b.doc_id // 2) % {K} = {k}
  GROUP BY 1, 2),
v AS (
  SELECT id_in, id_ex,
         ROUND(CAST(i AS DOUBLE) / (si.n + se.n - i) * 1e6) / 1e6
           AS jaccard
  FROM inter
   JOIN t_sizes si ON si.doc_id = id_in
   JOIN t_sizes se ON se.doc_id = id_ex
  WHERE i * 17 >= (si.n + se.n) * 7),
cnt AS (SELECT id_in, COUNT(*) AS n_matches FROM v GROUP BY id_in),
pick AS (
  SELECT id_in, id_ex, jaccard,
         row_number() OVER (PARTITION BY id_in
           ORDER BY jaccard DESC, id_ex) AS rn
  FROM v)
SELECT p.id_in AS doc_id, CAST(c.n_matches AS BIGINT) AS n_matches,
       p.id_ex AS best_match, p.jaccard AS best_jaccard
FROM pick p JOIN cnt c USING (id_in)
WHERE rn = 1"""
    if name == "p8_annlsh":
        # per-query top-3: every row of a query_id lives in its chunk
        return f"""WITH scored AS (
  SELECT qa.vec_id AS query_id, qb.vec_id AS neighbor_id, ka.bucket,
         ROUND(list_cosine_similarity(
           list_transform(qa.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(qb.embedding, x -> CAST(x AS DOUBLE))), 6) AS sim
  FROM embeddings qa JOIN t_bk ka ON qa.vec_id = ka.vec_id
   JOIN t_bk kb ON ka.bucket = kb.bucket
   JOIN embeddings qb ON qb.vec_id = kb.vec_id
  WHERE qa.vec_id <> qb.vec_id AND qa.vec_id % {K} = {k})
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id
         ORDER BY sim DESC, neighbor_id) AS BIGINT) AS rnk,
       neighbor_id, sim, bucket
FROM scored QUALIFY rnk <= 3"""
    if name == "p60_lshrecall":
        # per-chunk exact/hit counts; candidates counted once (chunk 0)
        return f"""WITH inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM t_sh a JOIN t_sh b ON a.shingle = b.shingle
                         AND a.doc_id < b.doc_id
  WHERE a.doc_id % {K} = {k}
  GROUP BY a.doc_id, b.doc_id),
exact AS (
  SELECT id_a, id_b FROM inter
   JOIN t_sizes sa ON sa.doc_id = id_a
   JOIN t_sizes sb ON sb.doc_id = id_b
  WHERE i * 17 >= (sa.n + sb.n) * 7)
SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
       (SELECT COUNT(*) FROM exact e JOIN t_cands c
          ON e.id_a = c.id_a AND e.id_b = c.id_b) AS n_hit"""
    raise KeyError(name)


SORT_KEYS = {
    "p45_containment": ["id_a", "id_b"],
    "p10_lshdedup": ["id_a", "id_b"],
    "p23_increment": ["doc_id"],
    "s4_streamincrement": ["doc_id"],
    "p8_annlsh": ["query_id", "rnk"],
    "p13_annkmeans": ["query_id", "rnk"],
    "p18_components": ["doc_id"],
    "p31_priority": ["doc_id"],
    "p42_leaksafesplit": ["doc_id"],
    "p58_dupgraph": ["degree"],
    "p43_dupmatrix": ["src_lo", "src_hi"],
    "p12_curation": ["lang_pred"],
    "p64_funnelreport": ["source"],
}

# ---------------------------------------------------------------------
# Edge-consumer family (r13, OracleCoverageSpec): seven declared
# queries embed the SAME all-pairs shingle self-join (`inter` +
# 17i >= 7(na+nb) threshold) and differ only in a LINEAR tail
# (components, degree stats, source matrix, curation report). The
# superlinear stage is the join, so the chunked replay materializes
# the >= tau EDGE list residue class by residue class into t_edges
# (bounded output: the true near-dup pair set is linear in N), then
# runs each query's tail ONCE. Tail SQL is verbatim from the oracle
# with edges/dropped rewritten against t_edges and toks against
# t_toks.
EDGE_SETUP = [
    "CREATE TEMP TABLE t_edges (id_a BIGINT, id_b BIGINT)"]


def edge_chunk_sql(k, K):
    return f"""INSERT INTO t_edges
WITH inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM t_sh a JOIN t_sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  WHERE a.doc_id % {K} = {k}
  GROUP BY a.doc_id, b.doc_id)
SELECT id_a, id_b FROM inter
 JOIN t_sizes sa ON sa.doc_id = id_a
 JOIN t_sizes sb ON sb.doc_id = id_b
WHERE i * 17 >= (sa.n + sb.n) * 7"""


_COMPONENTS = """WITH RECURSIVE
sym AS (SELECT id_a AS a, id_b AS b FROM t_edges
        UNION ALL SELECT id_b, id_a FROM t_edges),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.b, re.r FROM reach re JOIN sym s ON s.a = re.id),
comp AS (SELECT id AS doc_id, MIN(r) AS component_id
         FROM reach GROUP BY id)"""

_QUAL12 = """qual AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT)
      AS est_bpe_tokens,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
    ROUND(ln(CAST(len(string_split(text, ' ')) AS DOUBLE) + 1)
          * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' '))), 6) AS quality
  FROM documents)"""

_SCORES = """scores AS (
  SELECT doc_id,
   CAST(SUM(CASE WHEN token IN ('der','die','und','das','ein') THEN 1 ELSE 0 END) AS BIGINT) AS s_de,
   CAST(SUM(CASE WHEN token IN ('the','a','of','and','to','is') THEN 1 ELSE 0 END) AS BIGINT) AS s_en,
   CAST(SUM(CASE WHEN token IN ('el','la','de','y','que') THEN 1 ELSE 0 END) AS BIGINT) AS s_es,
   CAST(SUM(CASE WHEN token IN ('le','la','et','les','des') THEN 1 ELSE 0 END) AS BIGINT) AS s_fr,
   CAST(SUM(CASE WHEN token IN ('的','是','了','在','和') THEN 1 ELSE 0 END) AS BIGINT) AS s_zh
  FROM t_toks GROUP BY doc_id)"""

EDGE_FINAL = {
    "p18_components": _COMPONENTS + """
SELECT doc_id, component_id,
       COUNT(*) OVER (PARTITION BY component_id) AS component_size,
       doc_id = component_id AS keep
FROM comp ORDER BY doc_id""",

    "p31_priority": _COMPONENTS + """,
lab AS (
  SELECT c.doc_id, c.component_id, d.source,
         CAST(substr(d.source, 4) AS BIGINT) % 3 AS tier
  FROM comp c JOIN documents d USING (doc_id))
SELECT doc_id, component_id, source, tier,
       first_value(doc_id) OVER (PARTITION BY component_id
         ORDER BY tier, doc_id) AS keeper_id,
       doc_id = first_value(doc_id) OVER (PARTITION BY component_id
         ORDER BY tier, doc_id) AS keep
FROM lab ORDER BY doc_id""",

    "p42_leaksafesplit": _COMPONENTS + """,
banded AS (
  SELECT doc_id, component_id,
         CAST(('0x' || substr(md5('split-' ||
           CAST(component_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10
           AS band
  FROM comp)
SELECT doc_id, component_id,
       CASE WHEN band < 8 THEN 'train'
            WHEN band = 8 THEN 'val' ELSE 'test' END AS split
FROM banded ORDER BY doc_id""",

    "p58_dupgraph": """WITH sym AS (
  SELECT id_a AS doc_id FROM t_edges
  UNION ALL SELECT id_b FROM t_edges),
deg AS (SELECT doc_id, COUNT(*) AS degree FROM sym GROUP BY doc_id),
alld AS (
  SELECT d.doc_id, COALESCE(g.degree, 0) AS degree
  FROM documents d LEFT JOIN deg g USING (doc_id))
SELECT degree, COUNT(*) AS n_docs
FROM alld GROUP BY degree ORDER BY degree""",

    "p43_dupmatrix": """SELECT LEAST(da.source, db.source) AS src_lo,
       GREATEST(da.source, db.source) AS src_hi,
       COUNT(*) AS n_pairs
FROM t_edges
 JOIN documents da ON da.doc_id = id_a
 JOIN documents db ON db.doc_id = id_b
GROUP BY 1, 2 ORDER BY src_lo, src_hi""",

    "p12_curation": "WITH dropped AS (SELECT DISTINCT id_b AS doc_id"
                    " FROM t_edges),\n" + _QUAL12 + ",\n" + _SCORES + """,
lang AS (
  SELECT doc_id,
    CASE WHEN s_de >= GREATEST(s_en, s_es, s_fr, s_zh) THEN 'de'
         WHEN s_en >= GREATEST(s_es, s_fr, s_zh) THEN 'en'
         WHEN s_es >= GREATEST(s_fr, s_zh) THEN 'es'
         WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS lang_pred,
    GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS lang_score
  FROM scores)
SELECT lang_pred, COUNT(*) AS n_docs,
       CAST(SUM(est_bpe_tokens) AS BIGINT) AS budget_tokens,
       CAST(SUM(n_ws_tokens) AS BIGINT) AS ws_tokens
FROM qual
 JOIN lang USING (doc_id)
WHERE quality >= 0.5 AND n_tokens >= 5 AND lang_score > 0
  AND doc_id NOT IN (SELECT doc_id FROM dropped)
GROUP BY lang_pred ORDER BY lang_pred""",

    "p64_funnelreport": "WITH dropped AS (SELECT DISTINCT id_b AS doc_id"
                        " FROM t_edges),\n" + """qual AS (
  SELECT doc_id,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    ROUND(ln(CAST(len(string_split(text, ' ')) AS DOUBLE) + 1)
          * (CAST(len(list_distinct(string_split(text, ' ')))
               AS DOUBLE)
             / len(string_split(text, ' '))), 6) AS quality
  FROM documents),\n""" + _SCORES + """,
lang AS (
  SELECT doc_id,
    GREATEST(s_de, s_en, s_es, s_fr, s_zh) AS lang_score
  FROM scores),
staged AS (
  SELECT d.source,
    CASE WHEN q.quality >= 0.5 AND q.n_tokens >= 5
         THEN 1 ELSE 0 END AS pq,
    CASE WHEN l.lang_score > 0 THEN 1 ELSE 0 END AS pl,
    CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM dropped)
         THEN 1 ELSE 0 END AS pd
  FROM documents d
   JOIN qual q ON q.doc_id = d.doc_id
   JOIN lang l ON l.doc_id = d.doc_id)
SELECT source, COUNT(*) AS n_total,
       CAST(SUM(pq) AS BIGINT) AS n_quality,
       CAST(SUM(pq * pl) AS BIGINT) AS n_lang,
       CAST(SUM(pq * pl * pd) AS BIGINT) AS n_final,
       ROUND(CAST(SUM(pq * pl * pd) AS DOUBLE) / COUNT(*) * 1e6)
         / 1e6 AS retention
FROM staged GROUP BY source ORDER BY source""",
}

# global top-k queries: each chunk emits ITS top-k, pandas re-ranks the
# union (the global top-k is a subset of the per-chunk winners)
TOPK = {"p4_jaccard": ("jaccard", 50), "p14_sparsecos": ("cosine", 50)}

SUPPORTED = ["p4_jaccard", "p45_containment", "p10_lshdedup",
             "p23_increment", "s4_streamincrement", "p60_lshrecall",
             "p8_annlsh", "p13_annkmeans", "p14_sparsecos",
             "p12_curation", "p18_components", "p31_priority",
             "p42_leaksafesplit", "p43_dupmatrix", "p58_dupgraph",
             "p64_funnelreport"]


def run_one(con, name, K, out_dir):
    import pandas as pd
    for stmt in setup_for(name):
        con.execute(stmt)
    if name in EDGE_FINAL:
        # fill the edge table residue class by residue class (the only
        # superlinear stage), then the query's linear tail runs once
        for k in range(K):
            con.execute(edge_chunk_sql(k, K))
        parts = [con.execute(EDGE_FINAL[name]).df()]
    else:
        parts = [con.execute(chunk_sql(name, k, K)).df() for k in range(K)]
    for t in ["t_toks", "t_big", "t_sh", "t_shx", "t_sid", "t_sizes",
              "t_cands", "t_bk", "t_tf", "t_n2", "t_u", "t_pr",
              "t_assign", "t_probes", "t_edges"]:
        con.execute(f"DROP TABLE IF EXISTS {t}")
    if name in TOPK:
        scoreCol, topN = TOPK[name]
        duck = pd.concat(parts, ignore_index=True).sort_values(
            [scoreCol, "id_a", "id_b"],
            ascending=[False, True, True]).head(topN).reset_index(drop=True)
    else:
        duck = pd.concat(parts, ignore_index=True).sort_values(
            SORT_KEYS[name]).reset_index(drop=True)
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    spark = pd.concat([pd.read_parquet(f) for f in files],
                      ignore_index=True)
    return co.cmp(spark, duck)


def run_p60(con, K, out_dir):
    import pandas as pd
    for stmt in setup_for("p60_lshrecall"):
        con.execute(stmt)
    n_exact = n_hit = 0
    for k in range(K):
        p = con.execute(chunk_sql("p60_lshrecall", k, K)).df()
        n_exact += int(p["n_exact"].iloc[0])
        n_hit += int(p["n_hit"].iloc[0])
    n_cands = int(con.execute("SELECT COUNT(*) FROM t_cands").df().iloc[0, 0])
    recall = 1.0 if n_exact == 0 else round(n_hit / n_exact * 1e6) / 1e6
    duck = pd.DataFrame({
        "n_exact": pd.Series([n_exact], dtype="int64"),
        "n_candidates": pd.Series([n_cands], dtype="int64"),
        "n_hit": pd.Series([n_hit], dtype="int64"),
        "recall": pd.Series([recall], dtype="float64")})
    files = sorted(glob.glob(f"{out_dir}/p60_lshrecall/*.parquet"))
    spark = pd.concat([pd.read_parquet(f) for f in files],
                      ignore_index=True)
    return co.cmp(spark, duck)


def main(argv):
    sf_dir, out_dir = argv[0], argv[1]
    only, K, mem, json_path = None, 8, "24GB", None
    i = 2
    while i < len(argv):
        if argv[i] == "--only":
            only = set(argv[i + 1].split(",")); i += 2
        elif argv[i] == "--k":
            K = int(argv[i + 1]); i += 2
        elif argv[i] == "--mem":
            mem = argv[i + 1]; i += 2
        elif argv[i] == "--json":
            json_path = argv[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    names = [n for n in SUPPORTED if only is None or n in only]
    results = {}
    for name in names:
        con = co.connect(sf_dir, mem, tmp=f"/tmp/duckspill-chunk-{name}")
        try:
            if name == "p60_lshrecall":
                status = run_p60(con, K, out_dir)
            else:
                status = run_one(con, name, K, out_dir)
            status += f" (chunked K={K})"
        except Exception as e:
            status = f"CHUNKED ORACLE ERROR: {e}"
        finally:
            con.close()
        results[name] = status
        print(f"{name:<22} {status}", flush=True)
        if json_path:
            merged = {}
            if os.path.exists(json_path):
                with open(json_path) as f:
                    merged = json.load(f)
            merged.update(results)
            tmp = json_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(merged, f, indent=1, sort_keys=True)
            os.replace(tmp, json_path)
    bad = [n for n, s in results.items() if not s.startswith("OK")]
    print("ALL GREEN" if not bad else f"{len(bad)} FAILING: {bad}",
          flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
