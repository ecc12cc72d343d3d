"""Adversarial oracle-parity sweeps: run every contract query against
datasets designed to break cross-engine determinism.

Builds three derived datasets from sf0.001 (DuckDB-written single-file
parquet — Spark-written directories named *.parquet break the oracle's
view paths) and runs scripts/verify_local.py over each:

- nulls: NULLs in every nullable non-key column (found 11 divergences
  in round 3: NULL tokens in the packer, NOT IN vs NOT EXISTS, NULLS
  FIRST/LAST defaults, NULL vectors, time-window NULL event times, ...)
- uni:   adversarial Unicode appended to documents.text (found the
  Java-vs-DuckDB lower() special-casing split)
- tiny:  3 rows per table (degenerate joins/windows/aggregations)

Usage: python scripts/adversarial_verify.py [nulls|uni|tiny ...]
Exit 0 only if every requested sweep is fully green.
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
UNI = [
    "İstanbul STRASSE Grüße",
    "日本語のテキストです",
    "🎉 emoji ÷ math ① digits",
    "café naïve résumé",
    "ΣΙΣΥΦΟΣ ςσ",
    "áccent combining",
]


def build_nulls(con: duckdb.DuckDBPyConnection, dst: str) -> None:
    for t in TABLES:
        cols = con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        key = cols[0][0]
        sel = [key] + [
            f"CASE WHEN {key} % 3 = 1 THEN NULL ELSE {n} END AS {n}"
            for n, _, *_ in cols[1:]
        ]
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet') "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )


def build_uni(con: duckdb.DuckDBPyConnection, dst: str) -> None:
    for t in TABLES:
        if t == "documents":
            cases = " ".join(
                f"WHEN doc_id % 7 = {i + 1} THEN text || ' ' || '{u}'"
                for i, u in enumerate(UNI)
            )
            con.execute(
                f"COPY (SELECT doc_id, CASE {cases} ELSE text END AS text, "
                f"lang, source, n_chars FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )


def build_tiny(con: duckdb.DuckDBPyConnection, dst: str) -> None:
    for t in TABLES:
        key = con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()[0][0]
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet' ORDER BY {key} LIMIT 3) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )


BUILDERS = {"nulls": build_nulls, "uni": build_uni, "tiny": build_tiny}


def build_edge(con: duckdb.DuckDBPyConnection, dst: str) -> None:
    """Degenerate-population edges the tiny sweep can't hit:

    - documents reduced to {1, 5, 10}: the incremental-clustering
      contract query then runs with a SINGLE-DOC standing corpus
      (doc_id % 5 != 0 -> {1}) and a two-doc new batch — no pairs
      anywhere, empty clusterings on both engines;
    - embeddings stripped of every vec_id % 20 == 0 row: the
      semantic-decontamination eval set is EMPTY (and so is its leaked
      plant), so the detector must return zero hits without erroring on
      an empty LSH index.
    Everything else copies through unchanged.
    """
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet' WHERE doc_id IN (1, 5, 10)) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        elif t == "embeddings":
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet' WHERE vec_id % 20 <> 0) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )


BUILDERS["edge"] = build_edge


def build_dups(con: duckdb.DuckDBPyConnection, dst: str) -> None:
    """Duplicate-HEAVY corpus: every document reappears twice under
    fresh ids (one byte-identical, one with trailing whitespace — a
    near-dup at Jaccard 1.0 on tokenized shingles). Stresses the whole
    dedup family — exact groups, LSH banding, clustering tie-breaks,
    canonical selection, incremental folds — where min-id tie-break
    divergence between engines would first show. Embeddings gain exact
    vector copies likewise (near-dup at cosine 1.0)."""
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet' "
                f" UNION ALL SELECT doc_id + 100000, text, lang, source, n_chars"
                f"   FROM '{SRC}/{t}.parquet'"
                f" UNION ALL SELECT doc_id + 200000, text || '  ', lang, source, n_chars + 2"
                f"   FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        elif t == "embeddings":
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet' "
                f" UNION ALL SELECT vec_id + 100000, embedding, label"
                f"   FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )


BUILDERS["dups"] = build_dups


def build_corrupt(con: duckdb.DuckDBPyConnection, dst: str) -> None:
    """Corrupt-payload-HEAVY multimodal fixture: the catalog queries
    synthesize their JPEG/GIF/ADPCM/MJPEG payloads from doc_id and
    inject deterministic corruption for doc_id%13 in (5, 9)
    (workload._mm_corrupt: 60%/tail truncation, destroyed magic bytes).
    On natural ids ~15% of docs hit those classes; here every doc_id is
    remapped to 13*id + (5|9|0 by id%3), so two thirds of the corpus is
    corrupt — both engines must agree on every NULL field and every
    dropped row. Runs only the multimodal catalog queries (the rest of
    the catalog does not read payloads)."""
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"COPY (SELECT doc_id * 13 + CASE doc_id % 3 WHEN 0 THEN 5 "
                f"WHEN 1 THEN 9 ELSE 0 END AS doc_id, text, lang, source, "
                f"n_chars FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )


BUILDERS["corrupt"] = build_corrupt
# payload-reading queries only: the corrupt sweep's remapped doc ids
# exist to stress the decode contracts, not the text/relational catalog
SWEEP_QUERIES = {
    "corrupt": [
        "multimodal_jpeg_decode",
        "multimodal_gif_decode",
        "multimodal_adpcm_frames",
        "multimodal_video_frames",
        "multimodal_flac_frames",
        "multimodal_subband_frames",
        "multimodal_mcv_frames",
        "multimodal_image_decode",
        "multimodal_png_decode",
        "multimodal_audio_frames",
        "multimodal_resize",
        "multimodal_resize_jpeg",
        "multimodal_resize_png",
        "multimodal_audio_resample",
        "multimodal_resize_gif",
        "multimodal_video_thumbnails",
        "image_phash_crossformat",
        "audio_fingerprint_crossformat",
        "multimodal_avi_frames",
        "media_dedup_gate",
        "video_phash_crossformat",
        "video_phash_recut",
        "media_auto_diversity",
    ]
}


def main(argv: list[str]) -> int:
    sweeps = argv or list(BUILDERS)
    here = os.path.dirname(os.path.abspath(__file__))
    failed = []
    for name in sweeps:
        dst = f"/tmp/sf_adv_{name}"
        os.makedirs(dst, exist_ok=True)
        BUILDERS[name](duckdb.connect(), dst)
        print(f"=== sweep {name} -> {dst}")
        r = subprocess.run(
            [sys.executable, os.path.join(here, "verify_local.py"), dst]
            + SWEEP_QUERIES.get(name, []),
            cwd=os.path.dirname(here),
        )
        if r.returncode != 0:
            failed.append(name)
    if failed:
        print(f"FAILED sweeps: {failed}")
        return 1
    print("all adversarial sweeps green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
