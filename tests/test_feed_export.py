"""FEED export analog (FEED_FORMAT / FEED_EXPORT_ENCODING custom
settings — raywhiteoakleigh_com_au.py:24 and 5 more set utf-8;
nethouseprices_com.py:25-26 shows the json FEED_FORMAT pair): item
rows written as a distributed JSONL/CSV feed, with Scrapy's encoding
rule (ASCII-escape by default, literal UTF-8 only when
FEED_EXPORT_ENCODING asks)."""

import glob
import json
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pytest

from spider_ray.sink import export_items


def _table():
    return pa.table(
        {
            "external_id": ["a1", "b2"],
            "city": ["münchen", "paris"],
            "rent": [1200, 900],
            # multivalued field — Scrapy's CSV exporter joins with ","
            "images": [["u1", "u2"], ["u3"]],
        }
    )


def test_jsonl_utf8_literal(ray_session, tmp_path):
    out = export_items(_table(), str(tmp_path / "feed"), fmt="jsonl",
                       encoding="utf-8")
    files = glob.glob(out + "/*.json")
    assert files
    blob = b"".join(open(f, "rb").read() for f in files)
    assert "münchen".encode() in blob  # literal UTF-8, not \u-escaped
    rows = [json.loads(l) for f in files for l in open(f, encoding="utf-8")
            if l.strip()]
    assert sorted(r["external_id"] for r in rows) == ["a1", "b2"]


def test_jsonl_default_ascii_escapes(ray_session, tmp_path):
    """Scrapy's JSON exporter force-ASCII-escapes unless
    FEED_EXPORT_ENCODING overrides it."""
    out = export_items(_table(), str(tmp_path / "feed"), fmt="jsonl",
                       encoding="ascii")
    blob = b"".join(open(f, "rb").read()
                    for f in glob.glob(out + "/*.json"))
    assert "münchen".encode() not in blob
    assert b"m\\u00fcnchen" in blob
    # escaping is lossless — parsed values identical
    rows = [json.loads(l) for f in glob.glob(out + "/*.json")
            for l in open(f) if l.strip()]
    assert sorted(r["city"] for r in rows) == ["münchen", "paris"]


def test_csv_round_trip(ray_session, tmp_path):
    out = export_items(_table(), str(tmp_path / "feed"), fmt="csv")
    files = glob.glob(out + "/*.csv")
    assert files
    df = pd.concat([pd.read_csv(f) for f in files])
    assert sorted(df["city"]) == ["münchen", "paris"]
    assert int(df["rent"].sum()) == 2100
    assert sorted(df["images"]) == ["u1,u2", "u3"]  # joined multivalued


def test_bad_format_rejected(ray_session, tmp_path):
    with pytest.raises(ValueError):
        export_items(_table(), str(tmp_path / "feed"), fmt="xml")


def test_cli_export_round_trip(tmp_path):
    """End-to-end through the ray-job CLI shape: crawl → item feed on
    disk, row count matching the run's reported items."""
    feed = str(tmp_path / "feed")
    proc = subprocess.run(
        [sys.executable, "-m", "spider_ray", "--hosts", "3", "--pages", "2",
         "--details", "3", "--num-cpus", "4",
         "--export-items", feed, "--export-format", "jsonl"],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["items_feed"] == feed
    rows = [json.loads(l) for f in glob.glob(feed + "/*.json")
            for l in open(f, encoding="utf-8") if l.strip()]
    assert len(rows) == stats["items"] > 0
    assert all("external_link" in r for r in rows)
