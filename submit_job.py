"""spark-submit entry point for the full validation job (north rule).

spark-submit runs its primary file as a top-level ``__main__`` script, so it
cannot be a module *inside* the package (relative imports have no parent
package there). This launcher is the standard fix: the engine ships as
``--py-files okay_spark.zip`` (placed on every executor's and the driver's
``sys.path`` by spark-submit) and this file just dispatches into it:

    zip -qr okay_spark.zip okay_spark
    spark-submit --py-files okay_spark.zip submit_job.py \
        --input warehouse.docs --catalog warehouse.media \
        --output /sinks/validation --run-id nightly-2026-08-17

See scripts/submit_example.sh for the full cluster invocation and
tests/test_spark_submit.py for the executed end-to-end smoke.
"""

from okay_spark.job import main

if __name__ == "__main__":
    main()
