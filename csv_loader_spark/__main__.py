"""`python -m csv_loader_spark` → the reference-parity CLI (cli.py)."""

import sys

from csv_loader_spark.cli import main

sys.exit(main())
