from . import sinks  # noqa: F401
from .wrap import wrap_as_html, wrap_as_pdf  # noqa: F401
