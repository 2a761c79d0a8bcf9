"""``python -m quickwit_spark`` — see quickwit_spark/cli.py."""

import sys

from quickwit_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
