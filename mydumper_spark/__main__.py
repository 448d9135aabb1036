from mydumper_spark.cli import main

raise SystemExit(main())
