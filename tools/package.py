#!/usr/bin/env python
"""Build dist/camelot_spark.zip for `spark-submit --py-files`."""

import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    path = shutil.make_archive(
        os.path.join(dist, "camelot_spark"), "zip", root_dir=REPO, base_dir="camelot_spark"
    )
    print(path)
