"""review_crawler_spark — a PySpark-native crawl frontier & fetch scheduler.

A from-scratch distributed re-expression of the capabilities of
cognitive-metascience/review_crawler (reference at /root/reference, read-only):

- explicit ``frontier`` / ``url_seen`` tables instead of Scrapy's in-memory
  scheduler + RFPDupeFilter,
- RFC-3986 URL canonicalization + xxhash64 identity,
- partitioned-bloom prefilter + exact anti-join dedup,
- per-host politeness budgets enforced as window-rank top-k per wave,
- checkpointed wave loop (atomic snapshot manifests) so a killed run resumes,
- vectorized pandas/Arrow UDFs for parse / canonicalize / image decode —
  zero per-row Python in the engine hot path.

Everything is DataFrame/Catalyst-first; custom code is confined to the driver
wave loop, the bloom shards, and the batch UDFs (SURVEY.md §7).
"""

__version__ = "0.1.0"
