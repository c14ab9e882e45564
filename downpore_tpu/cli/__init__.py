from .framework import Command, make_args, parse_int, parse_float, parse_bool

__all__ = ["Command", "make_args", "parse_int", "parse_float", "parse_bool"]
