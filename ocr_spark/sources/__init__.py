from .wrap import wrap_as_html, wrap_as_pdf  # noqa: F401
