from slimt_tpu.html.html import HTML  # noqa: F401
