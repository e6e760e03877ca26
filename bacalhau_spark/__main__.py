from bacalhau_spark.cli import main

raise SystemExit(main())
