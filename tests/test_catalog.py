"""Catalog + history store (A10, A14, A19, A20)."""


class TestCatalog:
    def test_create_and_lookup(self, fresh_catalog):
        fresh_catalog.create_table("user", "example/user.csv", [{"field": "id"}], "demo")
        assert fresh_catalog.lookup(["user", "ghost"]) == {"user": "example/user.csv"}

    def test_lookup_empty(self, fresh_catalog):
        assert fresh_catalog.lookup([]) == {}

    def test_latest_registration_wins(self, fresh_catalog):
        fresh_catalog.create_table("t", "old.csv")
        fresh_catalog.create_table("t", "new.csv")
        assert fresh_catalog.lookup(["t"]) == {"t": "new.csv"}

    def test_temp_rows_hidden_from_listing(self, fresh_catalog):
        fresh_catalog.create_table("visible", "a.csv")
        fresh_catalog.create_table("temp_123_4567", "b.csv", type_="TEMP")
        listed = fresh_catalog.list_tables()
        assert [t["table_ref"] for t in listed] == ["visible"]
        assert listed[0]["table_schema"] == []

    def test_temp_still_resolvable(self, fresh_catalog):
        fresh_catalog.create_table("temp_1_1", "b.csv", type_="TEMP")
        assert fresh_catalog.lookup(["temp_1_1"]) == {"temp_1_1": "b.csv"}

    def test_gc_temp(self, fresh_catalog):
        fresh_catalog.create_table("temp_1_1", "b.csv", type_="TEMP")
        assert fresh_catalog.gc_temp(older_than_s=-1) == 1
        assert fresh_catalog.lookup(["temp_1_1"]) == {}

    def test_gc_temp_integer_epoch_compare(self, fresh_catalog):
        """The comparison must be numeric, not lexicographic TEXT: an
        old 9-digit-epoch row (pre-2001) is < any 10-digit cutoff
        numerically but > it as a string."""
        import sqlite3

        with sqlite3.connect(fresh_catalog.db_path) as conn:
            conn.execute(
                "INSERT INTO catalog (table_ref, table_path, type, created_at) "
                "VALUES ('temp_old_1', 'x.csv', 'TEMP', '2000-01-01 00:00:00')"
            )
        fresh_catalog.create_table("temp_new_1", "y.csv", type_="TEMP")
        # cutoff = now - 1 day: the 2000 row is stale, today's is not
        assert fresh_catalog.gc_temp(older_than_s=86400.0) == 1
        assert fresh_catalog.lookup(["temp_old_1"]) == {}
        assert fresh_catalog.lookup(["temp_new_1"]) == {"temp_new_1": "y.csv"}

    def test_lookup_beyond_sqlite_variable_limit(self, fresh_catalog):
        fresh_catalog.create_table("t_7", "p7.csv")
        names = [f"t_{i}" for i in range(1500)]
        assert fresh_catalog.lookup(names) == {"t_7": "p7.csv"}


class TestHistory:
    def test_record_and_list(self, fresh_catalog):
        fresh_catalog.record_query("SELECT 1", "successful")
        fresh_catalog.record_query("SELECT nope", "fail")
        h = fresh_catalog.history()
        assert [r["status"] for r in h] == ["fail", "successful"]  # desc

    def test_limit_30(self, fresh_catalog):
        for i in range(40):
            fresh_catalog.record_query(f"SELECT {i}", "successful")
        h = fresh_catalog.history(limit=30)
        assert len(h) == 30
        assert h[0]["sql"] == "SELECT 39"
