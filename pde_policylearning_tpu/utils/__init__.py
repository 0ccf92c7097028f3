from .config import (DotDict, default_parser, load_yaml, merge_args_with_yaml,
                     parse_and_load, save_yaml)

__all__ = ["DotDict", "default_parser", "load_yaml", "merge_args_with_yaml",
           "parse_and_load", "save_yaml"]
