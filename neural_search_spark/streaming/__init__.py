from neural_search_spark.streaming.ingest import stream_index_updates

__all__ = ["stream_index_updates"]
