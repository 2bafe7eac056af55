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
