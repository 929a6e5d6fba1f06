from .parse import get_parser, list_parsers, register_parser  # noqa: F401
