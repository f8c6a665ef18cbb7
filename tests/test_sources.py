"""Corpus source resolution, the spark-submit build entry, and the
text_embedding stub plumbing."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from neural_search_spark.sources import read_corpus_table


def test_read_corpus_parquet_with_derived_ids(spark, tiny_corpus, tmp_path):
    p = str(tmp_path / "corpus_pq")
    tiny_corpus.drop("docID", "content_sha256").write.parquet(p)
    df = read_corpus_table(spark, p)
    assert "docID" in df.columns and "content_sha256" in df.columns
    # docID is deterministic and unique per (repo, path, commit)
    n = df.count()
    assert df.select("docID").distinct().count() == n
    again = read_corpus_table(spark, p)
    assert df.select("docID").collect() == again.select("docID").collect()
    # invariant column is correct
    bad = df.where(F.sha2(F.col("content"), 256) != F.col("content_sha256")).count()
    assert bad == 0


def test_read_corpus_jsonl_and_csv(spark, tiny_corpus, tmp_path):
    """Raw-dump interchange formats resolve to the same corpus: identical
    derived docIDs and content hashes as the parquet path, including code
    content with embedded newlines/quotes/commas (csv multiline quoting)."""
    base = tiny_corpus.drop("docID", "content_sha256")
    pq = str(tmp_path / "c_pq")
    base.write.parquet(pq)
    want = {
        (r["docID"], r["content_sha256"])
        for r in read_corpus_table(spark, pq).select("docID", "content_sha256").collect()
    }
    assert want  # non-empty corpus

    jd = str(tmp_path / "c_jsonl")
    base.write.json(jd)
    jl = str(tmp_path / "c.jsonl")
    import glob
    import shutil

    with open(jl, "wb") as out:
        for part in sorted(glob.glob(jd + "/part-*")):
            with open(part, "rb") as f:
                shutil.copyfileobj(f, out)
    got_j = {
        (r["docID"], r["content_sha256"])
        for r in read_corpus_table(spark, jl).select("docID", "content_sha256").collect()
    }
    assert got_j == want

    cd = str(tmp_path / "c_csvdir")
    # single-file csv so header handling is unambiguous
    base.coalesce(1).write.option("header", True).option("quote", '"').option(
        "escape", '"'
    ).csv(cd)
    cf = sorted(glob.glob(cd + "/part-*.csv"))
    cpath = str(tmp_path / "c.csv")
    shutil.copyfile(cf[0], cpath)
    got_c = {
        (r["docID"], r["content_sha256"])
        for r in read_corpus_table(spark, cpath).select("docID", "content_sha256").collect()
    }
    assert got_c == want


def test_read_corpus_validates_schema(spark, tmp_path):
    p = str(tmp_path / "bad_pq")
    spark.range(3).write.parquet(p)
    with pytest.raises(ValueError, match="missing required columns"):
        read_corpus_table(spark, p)


def test_submit_build_local_smoke(tmp_path):
    out = str(tmp_path / "subidx")
    r = subprocess.run(
        [
            sys.executable,
            "tools/submit_build.py",
            "--source",
            "/root/testdata/sf0.001",
            "--out",
            out,
            "--n-shards",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["summary"]["n_docs"] == 500
    assert rep["metrics"]["raw_rows"] > 0


def test_text_embedding_stub_shape(spark, tiny_corpus):
    from neural_search_spark.pipeline.embedding import text_embedding_stub

    emb = text_embedding_stub(tiny_corpus).collect()
    assert len(emb) == tiny_corpus.count()
    for r in emb[:10]:
        v = r["embedding"]
        assert len(v) == 8
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # L2-normalized


def _shape(dt):
    """(name, type) tree ignoring nullability — Spark derives nullable
    flags from expressions; they are advisory, not part of the contract."""
    from pyspark.sql.types import ArrayType, StructType

    if isinstance(dt, StructType):
        return ("struct", tuple((f.name, _shape(f.dataType)) for f in dt.fields))
    if isinstance(dt, ArrayType):
        return ("array", _shape(dt.elementType))
    return dt.simpleString()


def test_semantic_schema_derivation(spark, tiny_corpus):
    """SemanticMappingTransformer analog: the derived <field>_semantic_info
    struct lands in the schema, and apply_semantic_mapping's output schema
    IS the derived schema."""
    from neural_search_spark.mapping import (
        apply_semantic_mapping,
        derive_semantic_schema,
        semantic_info_field_name,
    )

    base = tiny_corpus.schema
    derived = derive_semantic_schema(base, "content")
    assert semantic_info_field_name("content") == "content_semantic_info"
    names = [f.name for f in derived.fields]
    assert names == [f.name for f in base.fields] + ["content_semantic_info"]
    info = derived["content_semantic_info"].dataType
    assert [f.name for f in info.fields] == ["model", "embedding"]

    out = apply_semantic_mapping(tiny_corpus, "content", "stand-in-dense-v1")
    assert _shape(out.schema["content_semantic_info"].dataType) == _shape(info)
    row = out.where("docID = 0").select("content_semantic_info").collect()[0][0]
    assert row["model"]["id"] == "stand-in-dense-v1"
    assert len(row["embedding"]) == 8
    # embedding equals the standalone text_embedding processor output
    from neural_search_spark.pipeline.embedding import text_embedding_stub

    want = text_embedding_stub(tiny_corpus).where("docID = 0").collect()[0]["embedding"]
    assert row["embedding"] == want


def test_semantic_schema_validation(tiny_corpus):
    import pytest as _pytest

    from neural_search_spark.mapping import derive_semantic_schema

    with _pytest.raises(ValueError, match="not found"):
        derive_semantic_schema(tiny_corpus.schema, "missing_col")
    once = derive_semantic_schema(tiny_corpus.schema, "content")
    with _pytest.raises(ValueError, match="already exists"):
        derive_semantic_schema(once, "content")


def test_semantic_chunking_schema(tiny_corpus):
    from neural_search_spark.mapping import derive_semantic_schema

    derived = derive_semantic_schema(tiny_corpus.schema, "content", chunking=True)
    info = derived["content_semantic_info"].dataType
    assert [f.name for f in info.fields] == ["model", "chunks"]
    chunk = info["chunks"].dataType.elementType
    assert [f.name for f in chunk.fields] == ["text", "embedding"]


def test_read_corpus_table_semantic_field(spark, tiny_corpus_pdf, tmp_path):
    from neural_search_spark.mapping import derive_semantic_schema
    from neural_search_spark.sources.corpus_source import read_corpus_table

    p = str(tmp_path / "corpus_sem")
    spark.createDataFrame(tiny_corpus_pdf).write.parquet(p)
    df = read_corpus_table(spark, p, semantic_field="content")
    base = read_corpus_table(spark, p)
    want = derive_semantic_schema(base.schema, "content")
    assert _shape(df.schema) == _shape(want)
