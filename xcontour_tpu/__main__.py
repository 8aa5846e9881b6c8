"""``python -m xcontour_tpu`` entry point (see cli.py)."""
import sys

from .cli import main

sys.exit(main())
