"""S3/S4: host-partitioned fetch stage with injected fetcher.

Mirrors the reference's fetch semantics (utils.py:41-49): per-host pacing,
403-in-body detection, per-row error isolation — with a dict-backed fake
fetcher standing in for requests (no network in this sandbox)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from review_crawler_spark.crawler.fetch import fetch_pages


def _scheduled(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, canonical_url string, url_hash long, host string, "
        "priority long, depth int, wave int, seq long",
    )


def _rows(n_per_host, hosts):
    rows = []
    h = 0
    for host in hosts:
        for i in range(n_per_host):
            u = f"https://{host}/p{i}"
            rows.append((u, u, hash(u), host, 5, 1, 0, h * 100 + i))
        h += 1
    return rows


def test_fetch_statuses_and_error_isolation(spark):
    pages = {
        "https://a.com/p0": (200, b"<html>ok</html>"),
        "https://a.com/p1": (200, b"...403 Forbidden..."),
        # p2 raises (timeout-like)
    }

    def fake(url):
        if url not in pages:
            raise TimeoutError(f"timed out: {url}")
        status, body = pages[url]
        if b"403 Forbidden" in body:
            return 403, body
        return status, body

    df = _scheduled(spark, _rows(3, ["a.com"]))
    out = {r["url"]: r for r in fetch_pages(df, fake, pace=False).collect()}
    assert out["https://a.com/p0"]["status"] == 200
    assert bytes(out["https://a.com/p0"]["body"]) == b"<html>ok</html>"
    assert out["https://a.com/p1"]["status"] == 403
    assert out["https://a.com/p2"]["status"] == 0
    assert "timed out" in out["https://a.com/p2"]["fetch_error"]


def test_fetch_paces_within_host(spark):
    """≥ min_tbr between same-host requests (utils.py:16-17,43-45)."""
    df = _scheduled(spark, _rows(3, ["a.com", "b.com"]))
    out = fetch_pages(
        df, lambda u: (200, b"x"), min_tbr=0.3, pace=True
    ).collect()
    by_host: dict[str, list[float]] = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["fetched_at"])
    assert len(out) == 6
    for host, stamps in by_host.items():
        stamps.sort()
        gaps = [b - a for a, b in zip(stamps, stamps[1:])]
        assert all(g >= 0.28 for g in gaps), (host, gaps)


def test_fetch_partitions_by_host(spark):
    """Each host's rows land in one task (politeness needs host locality)."""
    df = _scheduled(spark, _rows(4, ["a.com", "b.com", "c.com"]))
    out = (
        fetch_pages(df, lambda u: (200, b"x"), pace=False)
        .withColumn("part", F.spark_partition_id())
        .collect()
    )
    parts_per_host: dict[str, set] = {}
    for r in out:
        parts_per_host.setdefault(r["host"], set()).add(r["part"])
    for host, parts in parts_per_host.items():
        assert len(parts) == 1, (host, parts)

def test_fetch_cohosted_tasks_interleave(spark):
    """Co-resident hosts in ONE task must not serialize each other's pacing
    (round-2 ADVICE): with k hosts sharing a task, total wall approaches the
    per-host floor (n-1)*min_tbr, not k*(n-1)*min_tbr."""
    hosts = ["a.com", "b.com", "c.com", "d.com"]
    n, tbr = 4, 0.3
    df = _scheduled(spark, _rows(n, hosts)).coalesce(1)  # force co-residency
    t0 = time.time()
    out = fetch_pages(df, lambda u: (200, b"x"), min_tbr=tbr, pace=True).collect()
    wall = time.time() - t0
    assert len(out) == n * len(hosts)
    # per-host floor still holds
    by_host: dict[str, list[float]] = {}
    for r in out:
        by_host.setdefault(r["host"], []).append(r["fetched_at"])
    for host, stamps in by_host.items():
        stamps.sort()
        assert all(b - a >= 0.28 for a, b in zip(stamps, stamps[1:])), host
    # a scalar pacer would need >= (k*n - 1) * tbr = 4.5 s of sleeps; the
    # interleaved pacer needs only ~(n-1)*tbr = 0.9 s. Allow generous
    # overhead headroom while staying far below the serialized bound.
    assert wall < (len(hosts) * n - 1) * tbr * 0.75, wall
