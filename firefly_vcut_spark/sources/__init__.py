from firefly_vcut_spark.sources.catalog import load_table, register_views

__all__ = ["load_table", "register_views"]
