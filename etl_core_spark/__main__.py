from etl_core_spark.cli import main

raise SystemExit(main())
