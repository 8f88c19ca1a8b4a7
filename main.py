#!/usr/bin/env python3
"""Entry shim: ``python main.py --task ...`` (reference main.py CLI surface).

The implementation lives in deepemia_tpu/cli/main.py.
"""

from deepemia_tpu.cli.main import cli_entry

if __name__ == "__main__":
    cli_entry()
