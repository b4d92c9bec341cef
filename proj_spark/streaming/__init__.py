"""Structured Streaming jobs over the engine's tables."""

from proj_spark.streaming.jobs import (  # noqa: F401
    stream_events_hourly, stream_tile_density, stream_domain_running_counts,
    stream_exact_dedup, stream_minhash_neardup, stream_simhash_neardup,
    stream_sessionize, stream_asof_enrich, stream_tile_pyramid,
    stream_funnel)
