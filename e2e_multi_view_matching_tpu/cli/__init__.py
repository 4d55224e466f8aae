"""Command-line entry points: train, eval_pairs, eval_multi_view, convert_megadepth."""
