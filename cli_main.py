#!/usr/bin/env python3
"""Entry shim for the interactive wizard (reference cli_main.py surface)."""

from deepemia_tpu.cli.wizard import cli_entry

if __name__ == "__main__":
    cli_entry()
