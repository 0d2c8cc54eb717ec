"""CLI front-end (reference main.py:14-87, Typer -> stdlib argparse here;
same flags, same config-dict construction, interactive wizard fallback).

    python -m laposte_data_engineering_jedha_spark.plans.cli \
        --generate-rows 100000 --output-format all_but_xlsx
"""

from __future__ import annotations

import argparse
import sys

from ..session import get_spark
from .load import ALL_FORMATS
from .pipeline import Pipeline

FORMAT_CHOICES = [*ALL_FORMATS, "all", "all_but_xlsx", "preview"]


def build_config(args: argparse.Namespace) -> dict:
    """Flags -> config dict (reference main.py:61-81): --generate-rows xor
    --source-file."""
    if args.generate_rows is not None and args.source_file:
        raise SystemExit("--generate-rows and --source-file are mutually exclusive")
    if args.generate_rows is not None:
        source = {"type": "generate", "rows": args.generate_rows, "seed": args.seed}
    elif args.source_file:
        source = {"type": "file", "path": args.source_file}
    else:
        source = _wizard()
    return {
        "source": source,
        "output": {"path": args.output_path, "format": args.output_format},
    }


def _wizard() -> dict:
    """Interactive fallback (reference main.py:14-59)."""
    if not sys.stdin.isatty():
        raise SystemExit("no source given and stdin is not a TTY; pass --generate-rows or --source-file")
    choice = input("Source [g]enerate or [f]ile? ").strip().lower()
    if choice.startswith("g"):
        rows = int(input("How many rows? [1000] ") or "1000")
        return {"type": "generate", "rows": rows}
    return {"type": "file", "path": input("Path to source file: ").strip()}


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="laposte-etl", description="SuperCourier ETL (PySpark)")
    parser.add_argument("--generate-rows", type=int, default=None)
    parser.add_argument("--source-file", type=str, default=None)
    parser.add_argument("--output-path", type=str, default="output")
    parser.add_argument("--output-format", choices=FORMAT_CHOICES, default="csv")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    config = build_config(args)
    spark = get_spark(app_name="laposte_etl_cli")
    duration = Pipeline(config, spark).run()
    print(f"Pipeline completed in {duration:.2f}s")


if __name__ == "__main__":
    main()
