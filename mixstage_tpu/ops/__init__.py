from mixstage_tpu.ops.mixture import index_select_outputs  # noqa: F401
