"""``python -m zonal_stats_toolkit_ray config.ini`` — CLI parity with the
reference's ``python runner.py config.ini`` (runner.py:1054-1101)."""

from .api import main

if __name__ == "__main__":
    main()
