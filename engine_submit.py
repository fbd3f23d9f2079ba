"""spark-submit entry point (spark-submit can't run -m modules).

    zip -r engine.zip text_retrieval_and_search_engines_spark
    spark-submit --py-files engine.zip engine_submit.py index --pages ... --catalog ...
"""

from __future__ import annotations

import sys

from text_retrieval_and_search_engines_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
