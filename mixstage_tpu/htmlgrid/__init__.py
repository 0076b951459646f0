from mixstage_tpu.htmlgrid.to_html import get_list_files, make_html_file  # noqa: F401
