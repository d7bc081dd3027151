"""URL curation kernels (functions/urlx.py) and the url_table /
domain_stats pipeline (pipelines/curate.py)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from dup_ocropy_ray.functions.urlx import (
    BLOCKED_DOMAINS,
    normalize_url,
    parse_url,
    path_depth,
    registered_domain,
    resolve_dot_segments,
    strip_tracking_params,
    url_features,
)


def test_parse_basic_and_case():
    p = parse_url("HTTPS://WWW.Example.COM:8443/Path/A?q=1&Q=2#Frag")
    assert p["scheme"] == "https"
    assert p["host"] == "www.example.com"
    assert p["port"] == "8443"
    assert p["path"] == "/Path/A"          # path keeps case
    assert p["query"] == "q=1&Q=2"
    assert p["fragment"] == "Frag"


def test_parse_degenerate_inputs():
    assert parse_url("")["host"] == ""
    p = parse_url("example.com/x")          # schemeless
    assert p["scheme"] == "" and p["host"] == "example.com"
    assert p["path"] == "/x"
    assert parse_url("https://h#f?notquery")["fragment"] == "f?notquery"


def test_dot_segments():
    assert resolve_dot_segments("/a/./b/../c") == "/a/c"
    assert resolve_dot_segments("/../../x") == "/x"
    assert resolve_dot_segments("/a/b/..") == "/a"
    assert resolve_dot_segments("") == "/"


def test_tracking_params():
    assert strip_tracking_params("utm_source=a&id=1&UTM_medium=b&z=2") \
        == "id=1&z=2"
    assert strip_tracking_params("utm_only=x") == ""
    assert strip_tracking_params("") == ""


def test_normalize_ports_and_fragment():
    assert normalize_url("HTTP://A.com:80/x#f") == "http://a.com/x"
    assert normalize_url("https://a.com:443/") == "https://a.com/"
    assert normalize_url("https://a.com:8443/x") == "https://a.com:8443/x"
    assert normalize_url("http://a.com") == "http://a.com/"


def test_registered_domain_suffix_rules():
    assert registered_domain("a.b.site.co.uk") == "site.co.uk"
    assert registered_domain("site.co.uk") == "site.co.uk"
    assert registered_domain("co.uk") == "co.uk"          # bare suffix
    assert registered_domain("deep.www.x.com") == "x.com"
    assert registered_domain("x.unknowntld") == "x.unknowntld"
    assert registered_domain("localhost") == "localhost"  # dotless


def test_url_features_blocklist():
    f = url_features("http://ads.src3.net/track/1")
    assert f["domain"] == "src3.net" and f["blocked"]
    f = url_features("http://ads.src2.net/track/1")
    assert not f["blocked"]
    assert "src3.net" in BLOCKED_DOMAINS and "src2.net" not in BLOCKED_DOMAINS


def test_path_depth():
    assert path_depth("/") == 0
    assert path_depth("/a/b/") == 2
    assert path_depth("/a/b/c") == 3


def test_url_table_matches_twin_on_synthetic_docs(ray_session):
    from dup_ocropy_ray.pipelines.curate import domain_stats, url_table
    from dup_ocropy_ray.pipelines.queries import (
        SQL_DOMAIN_STATS,
        SQL_URL_FEATURES,
    )

    df = pd.DataFrame({
        "doc_id": np.arange(36, dtype="int64"),
        "source": [f"src{i % 7}" for i in range(36)],
    })
    con = duckdb.connect()
    con.register("docs_src", df)
    con.sql("CREATE VIEW documents AS SELECT * FROM docs_src")

    got = (url_table(rd.from_pandas(df).repartition(3)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = con.sql(SQL_URL_FEATURES).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got2 = domain_stats(rd.from_pandas(df).repartition(3))
    want2 = con.sql(SQL_DOMAIN_STATS).df()
    pd.testing.assert_frame_equal(got2, want2.reset_index(drop=True),
                                  check_dtype=False)
