"""spark-submit entry point: thin shim over pagerank_project_spark.cli
(the package arrives via --py-files; see tools/submit.sh)."""

import sys

from pagerank_project_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
