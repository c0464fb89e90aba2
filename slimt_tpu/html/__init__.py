from slimt_tpu.html.html import HTML  # noqa: F401
from slimt_tpu.html.scanner import BadHTML, ScanError  # noqa: F401
