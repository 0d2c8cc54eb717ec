#!/usr/bin/env python
"""CLI wrapper: synthesize the benchmark/fixture tables at a scale factor.

    python scripts/make_testdata.py /tmp/sf0.001 --sf 0.001

Produces the same ten-table star schema the round driver pre-generates
(see TESTDATA.md); used by CI and by conftest.py when /root/testdata is
absent (i.e. anywhere outside the round driver's container).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from laposte_data_engineering_jedha_spark.sources.testdata import main

if __name__ == "__main__":
    main()
