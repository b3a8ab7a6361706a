import pytest

from seatunnel_spark.lake.catalog import Catalog
from seatunnel_spark.lake.merge import merge_into
from seatunnel_spark.schema import REPO_FIELDS, REPO_KEY


def test_catalog_lifecycle(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"))
    assert cat.list_tables() == []
    t = cat.create_table("repos", REPO_FIELDS, REPO_KEY, num_buckets=2)
    assert cat.list_tables() == ["repos"]
    with pytest.raises(FileExistsError):
        cat.create_table("repos", REPO_FIELDS, REPO_KEY)
    df = spark.createDataFrame(
        [("o/r", "a.py", "c", "py", "x", "I", 0)],
        "repo string, path string, commit string, lang string, content string, op string, seq long",
    )
    merge_into(spark, t, df, "e1")
    assert cat.load_table("repos").scan(spark).count() == 1
    cat.drop_table("repos")
    assert cat.list_tables() == []
    with pytest.raises(FileNotFoundError):
        cat.load_table("repos")
    with pytest.raises(ValueError):
        cat.create_table("../evil", REPO_FIELDS, REPO_KEY)
