#!/usr/bin/env python3
"""Prototype sandbox for LLM-pipeline oracle SQLs (DuckDB dialect).

HISTORICAL: the authoritative oracle SQL lives in
src/main/scala/graft/operators/PipelineOracle.scala (and Relational.scala
for q01-q22); this script is kept as the scratchpad used to validate new
oracles before mirroring them into Scala. Some entries here predate later
fixes - do not copy from here without re-validating."""
import duckdb, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

P = 2147483647
K = 16          # minhash signature size
R = 2           # rows per band -> 8 bands
NB = K // R

def mh_cols():
    cols = []
    for j in range(1, K + 1):
        a = (j * 2654435761) % P
        b = (j * 40503 + 7) % P
        cols.append(f"MIN(({a}*hm + {b}) % {P}) AS m{j}")
    return ", ".join(cols)

def band_rows(alias):
    rows = []
    for b in range(NB):
        j1, j2 = 2 * b + 1, 2 * b + 2
        rows.append(f"SELECT doc_id, {b} AS band, m{j1} AS k1, m{j2} AS k2 FROM {alias}")
    return " UNION ALL ".join(rows)

SQLS = {
# --- text analysis ---
"t01_token_count": """
SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens, n_chars
FROM documents ORDER BY doc_id""",

"t02_quality": """
WITH tok AS (
  SELECT doc_id, n_chars, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents)
SELECT doc_id,
  len(ws) AS n_tokens,
  ROUND(CAST(n_chars AS DOUBLE) / len(ws), 2) AS avg_token_len,
  ROUND(CAST(len([w FOR w IN ws IF w IN ('the','a','of','to','and','in','is','it')]) AS DOUBLE) / len(ws), 3) AS stop_ratio,
  ROUND(CAST(len([w FOR w IN ws IF w IN ('the','a','of','to','and','in','is','it')]) AS DOUBLE) / len(ws) * 0.5
        + CASE WHEN len(ws) BETWEEN 20 AND 80 THEN 0.5 ELSE 0.0 END, 3) AS quality
FROM tok ORDER BY doc_id""",

"t03_langid": """
WITH tok AS (
  SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents),
sc AS (
  SELECT doc_id, lang,
    len([w FOR w IN ws IF w IN ('the','a','is')]) AS s_en,
    len([w FOR w IN ws IF w IN ('le','la','et')]) AS s_fr,
    len([w FOR w IN ws IF w IN ('der','die','und')]) AS s_de
  FROM tok)
SELECT doc_id, lang,
  CASE WHEN s_en >= s_fr AND s_en >= s_de AND s_en > 0 THEN 'en'
       WHEN s_fr >= s_de AND s_fr > 0 THEN 'fr'
       WHEN s_de > 0 THEN 'de'
       ELSE 'und' END AS pred
FROM sc ORDER BY doc_id""",

"t04_fingerprint": """
SELECT doc_id,
  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents ORDER BY doc_id""",

# --- dedup ---
"dd01_exact": """
WITH fp AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents)
SELECT doc_id, fp,
  CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY fp) THEN true ELSE false END AS keep
FROM fp ORDER BY doc_id""",

"dd02_ngram_jaccard": """
WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS s
       FROM w, unnest(range(1, len(ws))) t(i)),
n AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS ida, b.doc_id AS idb, COUNT(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
SELECT ida, idb,
  ROUND(CAST(c AS DOUBLE) / (na.ns + nb.ns - c), 3) AS jaccard
FROM inter JOIN n na ON na.doc_id = ida JOIN n nb ON nb.doc_id = idb
WHERE CAST(c AS DOUBLE) / (na.ns + nb.ns - c) >= 0.3
ORDER BY ida, idb""",

"dd03_minhash_lsh": f"""
WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS s
       FROM w, unnest(range(1, len(ws))) t(i)),
hh AS (SELECT doc_id, s, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) % {P} AS hm FROM sh),
sig AS (SELECT doc_id, {mh_cols()} FROM hh GROUP BY doc_id),
bands AS ({band_rows('sig')}),
cand AS (SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
         FROM bands x JOIN bands y
           ON x.band = y.band AND x.k1 = y.k1 AND x.k2 = y.k2 AND x.doc_id < y.doc_id),
n AS (SELECT doc_id, COUNT(*) AS ns FROM sh GROUP BY doc_id),
inter AS (SELECT c.ida, c.idb, COUNT(*) AS cc
          FROM cand c JOIN sh a ON a.doc_id = c.ida JOIN sh b ON b.doc_id = c.idb AND a.s = b.s
          GROUP BY c.ida, c.idb)
SELECT i.ida, i.idb, ROUND(CAST(cc AS DOUBLE) / (na.ns + nb.ns - cc), 3) AS jaccard
FROM inter i JOIN n na ON na.doc_id = i.ida JOIN n nb ON nb.doc_id = i.idb
WHERE CAST(cc AS DOUBLE) / (na.ns + nb.ns - cc) >= 0.3
ORDER BY i.ida, i.idb""",

"dd04_simhash": """
WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
             FROM documents),
hh AS (SELECT doc_id, w, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h FROM tok),
bits AS (SELECT doc_id, j.j AS j,
           CASE WHEN SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS bit
         FROM hh, unnest(range(0, 32)) j(j) GROUP BY doc_id, j.j),
sig AS (SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS simhash FROM bits GROUP BY doc_id)
SELECT doc_id, simhash FROM sig ORDER BY doc_id""",

"dd05_simhash_pairs": """
WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
             FROM documents),
hh AS (SELECT doc_id, w, CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) AS h FROM tok),
bits AS (SELECT doc_id, j.j AS j,
           CASE WHEN SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) >= 0 THEN 1 ELSE 0 END AS bit
         FROM hh, unnest(range(0, 32)) j(j) GROUP BY doc_id, j.j),
sig AS (SELECT doc_id, CAST(SUM(bit * (CAST(1 AS BIGINT) << j)) AS BIGINT) AS simhash FROM bits GROUP BY doc_id),
bands AS (SELECT doc_id, simhash, b.b AS band, (simhash >> (b.b * 8)) & 255 AS bk
          FROM sig, unnest(range(0, 4)) b(b)),
cand AS (SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb, x.simhash AS ha, y.simhash AS hb
         FROM bands x JOIN bands y ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id)
SELECT ida, idb, bit_count(xor(ha, hb)) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 4
ORDER BY ida, idb""",

# --- embeddings ---
"ss01_cosine_topk": """
WITH el AS (SELECT vec_id, i.i AS i,
              CAST(ROUND(CAST(embedding[i.i + 1] AS DOUBLE) * 1000) AS BIGINT) AS q
            FROM embeddings, unnest(range(0, 64)) i(i)),
nrm AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2 FROM el GROUP BY vec_id),
dots AS (SELECT b.vec_id, CAST(SUM(a.q * b.q) AS BIGINT) AS dot
         FROM el a JOIN el b ON a.i = b.i AND a.vec_id = 0 AND b.vec_id <> 0
         GROUP BY b.vec_id)
SELECT d.vec_id,
  ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS cos
FROM dots d JOIN nrm na ON na.vec_id = 0 JOIN nrm nb ON nb.vec_id = d.vec_id
ORDER BY cos DESC, d.vec_id LIMIT 10""",

"ss02_neardup": """
WITH el AS (SELECT vec_id, i.i AS i,
              CAST(ROUND(CAST(embedding[i.i + 1] AS DOUBLE) * 1000) AS BIGINT) AS q
            FROM embeddings, unnest(range(0, 64)) i(i)),
nrm AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2 FROM el GROUP BY vec_id),
dots AS (SELECT a.vec_id AS ida, b.vec_id AS idb, CAST(SUM(a.q * b.q) AS BIGINT) AS dot
         FROM el a JOIN el b ON a.i = b.i AND a.vec_id < b.vec_id
         GROUP BY a.vec_id, b.vec_id),
sc AS (SELECT ida, idb,
         CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS c
       FROM dots JOIN nrm na ON na.vec_id = ida JOIN nrm nb ON nb.vec_id = idb)
SELECT ida, idb, ROUND(c, 4) AS cos FROM sc WHERE c >= 0.4 ORDER BY ida, idb""",

"ss03_lsh_ann": """
WITH el AS (SELECT vec_id, i.i AS i,
              CAST(ROUND(CAST(embedding[i.i + 1] AS DOUBLE) * 1000) AS BIGINT) AS q
            FROM embeddings, unnest(range(0, 64)) i(i)),
proj AS (SELECT vec_id, j.j AS j,
           CAST(SUM(q * ((((i + 1) * (j.j + 7) * 2654435761) % 97) - 48)) AS BIGINT) AS dot
         FROM el, unnest(range(0, 8)) j(j) GROUP BY vec_id, j.j),
bkt AS (SELECT vec_id, CAST(SUM(CASE WHEN dot >= 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id),
qb AS (SELECT bucket FROM bkt WHERE vec_id = 0),
cand AS (SELECT b.vec_id FROM bkt b, qb WHERE b.bucket = qb.bucket AND b.vec_id <> 0),
nrm AS (SELECT vec_id, CAST(SUM(q * q) AS BIGINT) AS n2 FROM el GROUP BY vec_id),
dots AS (SELECT b.vec_id, CAST(SUM(a.q * b.q) AS BIGINT) AS dot
         FROM el a JOIN el b ON a.i = b.i AND a.vec_id = 0
         JOIN cand c ON c.vec_id = b.vec_id GROUP BY b.vec_id)
SELECT d.vec_id,
  ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 4) AS cos
FROM dots d JOIN nrm na ON na.vec_id = 0 JOIN nrm nb ON nb.vec_id = d.vec_id
ORDER BY cos DESC, d.vec_id LIMIT 10""",
}

only = sys.argv[2:] if len(sys.argv) > 2 else None
for name, sql in SQLS.items():
    if only and name not in only:
        continue
    try:
        df = con.execute(sql).fetchdf()
        print(f"OK   {name}: {len(df)} rows; head:\n{df.head(3).to_string(index=False)}")
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:300]}")
