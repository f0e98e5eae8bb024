"""``python -m tigerbeetle_cdc_nats_spark`` — the thin main, mirroring
cmd/tb-cdc-nats/main.go:12-14."""

from tigerbeetle_cdc_nats_spark.cli import main

if __name__ == "__main__":
    main()
