"""Thin spark-submit launcher for the citykg pipeline.

spark-submit takes a script file (it has no `-m` module mode), so cluster
submission ships the package as a zip and runs this one-liner:

    cd /root/repo && python -c "import shutil; shutil.make_archive('citykg', 'zip', '.', 'citykg')"
    spark-submit --master <url> --py-files citykg.zip submit_pipeline.py \
        --input <docs parquet dir> --output <triple store dir> [--resume]

Everything else (arguments, stages, resume semantics) is
citykg/pipeline.py; tests/test_submit.py drives this path end-to-end
with a real spark-submit subprocess.
"""

from citykg.pipeline import run

if __name__ == "__main__":
    run()
