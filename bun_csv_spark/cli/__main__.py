from bun_csv_spark.cli.main import main

raise SystemExit(main())
