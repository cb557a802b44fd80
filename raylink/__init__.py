"""raylink — a Ray-Data-native record-linkage / data-processing engine.

Re-expresses the capabilities of the reference repo
(`irem-kaya/Address-Parsing`, read-only at /root/reference) as idiomatic
Ray Data pipelines: `ray.data.Dataset` -> `map_batches` over Arrow
batches, actor pools for stateful stages, `groupby`/`map_groups` for the
wide steps, streaming execution throughout.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` — the
caller (driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"
