"""S2/S3 through the transport seam: a fake in-memory PI Web API
server answers the same wire shapes the reference consumes
(/root/reference/src/pi/extraction/ingest.py:91-133,
/root/reference/src/pi/tree_generator.py:38-116), and the full
pull → cleanse → append and crawl → flatten → load paths run on it."""

from datetime import datetime

from pyspark.sql import functions as F

from industrial_data_pipeline_spark.sources import pi_client as PI
from industrial_data_pipeline_spark.sources.ingest import (
    IncrementalIngestor, cleanse)
from industrial_data_pipeline_spark.sources.mapping import mapping_df
from industrial_data_pipeline_spark.sources.tree import (
    extract_leaf_webids, flatten_tree)

BASE = "https://pi.example/piwebapi"


def _fake_pi_server():
    """Transport closure over a tiny asset model:
    server → db 'Plant' → Unit1 (leaf, 2 attrs), Unit2 → Sub1 (leaf,
    1 attr). Batch endpoint serves 2 timestamps per streamset, with
    one PI error object (dict value) mixed in."""
    calls = []

    def transport(method, url, body=None):
        calls.append((method, url))
        if url.endswith("/assetservers"):
            return {"Items": [{"WebId": "SRV1", "Name": "SRV"}]}
        if url.endswith("/assetservers/SRV1/assetdatabases"):
            return {"Items": [{"WebId": "DB1", "Name": "Plant"}]}
        if url.endswith("/assetdatabases/DB1/elements"):
            return {"Items": [{"WebId": "E1", "Name": "Unit1"},
                              {"WebId": "E2", "Name": "Unit2"}]}
        if url.endswith("/elements/E1/elements"):
            return {"Items": []}
        if url.endswith("/elements/E2/elements"):
            return {"Items": [{"WebId": "E3", "Name": "Sub1"}]}
        if url.endswith("/elements/E3/elements"):
            return {"Items": []}
        if url.endswith("/elements/E1/attributes"):
            return {"Items": [
                {"Name": "Temp", "WebId": "A1",
                 "Links": {"Point": f"{BASE}/points/P1"}},
                {"Name": "Pressure", "WebId": "A2", "Links": {}},
            ]}
        if url.endswith("/elements/E3/attributes"):
            return {"Items": [{"Name": "Flow", "WebId": "A3",
                               "Links": {"Point": f"{BASE}/points/P3"}}]}
        if url.endswith("/points/P1"):
            return {"Name": "KKS-TEMP-1"}
        if url.endswith("/points/P3"):
            raise RuntimeError("point lookup 500")  # kks degrades to None
        if url.endswith("/batch") and method == "POST":
            out = {}
            for rname, req in body.items():
                webid = req["resource"].split("/streamsets/")[1] \
                    .split("/")[0]
                out[rname] = {"Content": {"Items": [{
                    "Path": f"\\\\SRV\\Plant|{webid}",
                    "Items": [
                        {"Timestamp": "2024-03-01T01:00:00Z",
                         "Value": 1.5},
                        {"Timestamp": "2024-03-01T01:01:00Z",
                         "Value": {"Errors": ["No data"]}},
                    ]}]}}
            return out
        raise AssertionError(f"unexpected call: {method} {url}")

    return transport, calls


def test_crawl_matches_tree_cache_shape(spark):
    transport, _ = _fake_pi_server()
    roots = PI.crawl_server(transport, BASE)
    assert [r["name"] for r in roots] == ["Plant"]
    elements, attributes = flatten_tree(roots)
    names = {e[2] for e in elements}
    assert names == {"Plant", "Unit1", "Unit2", "Sub1"}
    # attrs only at leaves; failed Point lookup → kks None
    by_name = {a[2]: a for a in attributes}
    assert by_name["Temp"][3] == "KKS-TEMP-1"
    assert by_name["Flow"][3] is None
    # leaf webid extraction consumes the same doc (S5 seam)
    leaves = extract_leaf_webids(roots)
    assert leaves == {"Plant|Unit1": "E1", "Plant|Unit2|Sub1": "E3"}


def test_batch_pull_flattens_and_cleanses(spark):
    transport, _ = _fake_pi_server()
    raw = PI.fetch_interpolated(
        spark, transport, BASE, {"t1": "W1", "t2": "W2", "skip": ""},
        "2024-03-01T01:00:00Z", "2024-03-01T02:00:00Z")
    rows = raw.collect()
    # 2 webids × 2 timestamps; the error dict became NULL value
    assert len(rows) == 4
    assert {r.lookup_key for r in rows} \
        == {"\\\\SRV\\Plant|W1", "\\\\SRV\\Plant|W2"}
    assert sum(r.value is None for r in rows) == 2
    mapping = mapping_df(spark, {"\\\\SRV\\Plant|W1": 7,
                                 "\\\\SRV\\Plant|W2": 8})
    clean = cleanse(raw, mapping, tz_shift_hours=7).collect()
    assert len(clean) == 4  # NULL values survive; unmapped would drop
    assert {r.attribute_id for r in clean} == {7, 8}
    # +7h ICT shift applied to the ISO instant
    assert min(r.timestamp for r in clean) \
        == datetime(2024, 3, 1, 8, 0, 0)


def test_ingestor_over_pi_transport(spark, tmp_path):
    """End-to-end S2: IncrementalIngestor with the PI-backed fetch_fn
    appends cleansed batch rows into a fresh archive."""
    from industrial_data_pipeline_spark.catalog.store import ParquetStore
    transport, calls = _fake_pi_server()
    store = ParquetStore(spark, str(tmp_path))
    store.create_database("plant")
    fetch = PI.make_fetch_fn(spark, transport, BASE,
                             {"t1": "W1", "t2": "W2"})
    ing = IncrementalIngestor(
        spark, store, "plant",
        mapping_df(spark, {"\\\\SRV\\Plant|W1": 7,
                           "\\\\SRV\\Plant|W2": 8}),
        fetch, expected_rows_per_min=1, tz_shift_hours=7,
        default_start=datetime(2024, 3, 1, 1, 0))
    n = ing.run(datetime(2024, 3, 1, 1, 2))
    assert n == 4
    arch = store.archive_values("plant")
    assert arch.count() == 4
    assert {r[0] for r in arch.select("attribute_id").collect()} == {7, 8}
    assert any("/batch" in u for _m, u in calls)
