

class TestEditDistancePairs:
    def test_matches_bruteforce(self, spark):
        from plwordnet_spark.textops.dedup import edit_distance_pairs

        names = [
            "blue bolt", "blue belt", "blue bolts", "red widget",
            "red widget ", "green gear", "grean gear", "wholly other",
        ]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(names)], "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_pairs(df, max_dist=2).collect()
        }

        def lev(a, b):
            import functools

            @functools.lru_cache(maxsize=None)
            def d(i, j):
                if i == 0:
                    return j
                if j == 0:
                    return i
                return min(
                    d(i - 1, j) + 1,
                    d(i, j - 1) + 1,
                    d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
                )

            return d(len(a), len(b))

        want = {}
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                dd = lev(names[i].lower(), names[j].lower())
                if dd <= 2:
                    want[(i, j)] = dd
        assert got == want
        assert (0, 1) in got and got[(0, 1)] == 1  # bolt/belt

    def test_hot_gram_cap_only_affects_blocking(self, spark):
        from plwordnet_spark.textops.dedup import edit_distance_pairs

        # every string shares 'aaa'; capping it must not produce pairs
        # blocked ONLY by the hot gram
        names = ["aaax", "aaay", "aaazzz"]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(names)], "doc_id long, text string"
        )
        full = edit_distance_pairs(df, max_dist=3, max_block=10).count()
        capped = edit_distance_pairs(df, max_dist=3, max_block=2).count()
        assert full >= capped
        assert capped == 0  # 'aaa' and 'aa?' grams all hot at cap 2
