"""Navigation query tier unit tests (Q1-Q5) on the FBC-shaped fixture:
sorted listings, point lookups, icon extraction incl. the null/404 paths
(main.go:297-313), matching the reference's endpoint semantics."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F

from console_etl_spark import queries as nav
from console_etl_spark.ingest import shred_metas


def _metas(catalog_metas):
    return shred_metas(catalog_metas.filter(F.col("catalog") == "catalog0").drop("catalog"))


def test_list_packages_sorted_distinct(catalog_metas):
    metas = _metas(catalog_metas)
    got = [r.package for r in nav.list_packages(metas).collect()]
    assert got == sorted(set(got))
    assert len(got) > 0


def test_list_schemas_scoped_sorted(catalog_metas):
    metas = _metas(catalog_metas)
    pkg = nav.list_packages(metas).first().package
    got = [r.schema for r in nav.list_schemas(metas, pkg).collect()]
    assert got == sorted(set(got))
    # every listed schema really exists under that package
    for s in got:
        assert metas.filter((F.col("package") == pkg) & (F.col("schema") == s)).count() > 0


def test_list_objects_matches_filter(catalog_metas):
    metas = _metas(catalog_metas)
    row = metas.filter(F.col("schema") == "olm.bundle").first()
    got = [r.name for r in nav.list_objects(metas, row.package, "olm.bundle").collect()]
    assert got == sorted(got)
    assert row.name in got


def test_get_object_returns_blob(catalog_metas):
    metas = _metas(catalog_metas)
    row = metas.first()
    out = nav.get_object(metas, row.package, row["schema"], row.name).collect()
    assert len(out) == 1
    assert out[0].blob == row.blob


def test_get_object_missing_is_empty(catalog_metas):
    metas = _metas(catalog_metas)
    assert nav.get_object(metas, "nope", "olm.bundle", "missing").count() == 0


def test_icon_extraction_decodes_binary(catalog_metas):
    metas = _metas(catalog_metas)
    with_icon = metas.filter(
        (F.col("schema") == "olm.package")
        & F.col("blob").contains("base64data")
    ).first()
    out = nav.get_package_icon(metas, with_icon.package).collect()
    assert len(out) == 1
    blob = json.loads(with_icon.blob)
    assert bytes(out[0].icon_data) == base64.b64decode(blob["icon"]["base64data"])
    assert out[0].icon_mediatype == "image/svg+xml"


def test_icon_null_is_empty_result(catalog_metas):
    """icon == nil -> 404 in the reference (main.go:310-313); here an
    empty DataFrame."""
    metas = _metas(catalog_metas)
    no_icon = metas.filter(
        (F.col("schema") == "olm.package") & (~F.col("blob").contains("base64data"))
    ).first()
    assert no_icon is not None
    assert nav.get_package_icon(metas, no_icon.package).count() == 0


def test_icon_missing_package_is_empty(catalog_metas):
    metas = _metas(catalog_metas)
    assert nav.get_package_icon(metas, "no-such-package").count() == 0
