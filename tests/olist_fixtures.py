"""Hand-computable Olist-shaped staging fixtures (FIXTURES.md §A/§C).

Small enough to verify every output row by hand, while exercising each
reference data quirk: the category header row (`Olist DW.sql:67`), a
canceled order and a ≥2019 order (`:155`), NULL business_segment and
segment/product overlap (`:71-75`), NULL and 'unknown' origins
(`:179`), a sub-hour conversion that the `< 1` DELETE removes
(`:183-184`), and geolocation duplicates (`:96`).
"""

from __future__ import annotations

import datetime as dt

from olist_data_warehouse_spark import schemas


def ts(s: str) -> dt.datetime:
    return dt.datetime.strptime(s, "%Y%m%d %H:%M:%S")


def staging(spark) -> dict:
    orders = [
        ("o1", "c1", "delivered", ts("20180510 12:00:00"), None, None, None, None),
        ("o2", "c2", "delivered", ts("20180510 13:00:00"), None, None, None, None),
        ("o3", "c3", "canceled", ts("20180601 09:00:00"), None, None, None, None),
        ("o4", "c4", "delivered", ts("20190201 10:00:00"), None, None, None, None),
    ]
    order_items = [
        ("o1", 1, "p1", "s1", ts("20180512 00:00:00"), 10.0, 1.0),
        ("o1", 2, "p2", "s2", ts("20180512 00:00:00"), 20.0, 2.0),
        ("o2", 1, "p1", "s1", ts("20180513 00:00:00"), 30.0, 3.0),
        ("o3", 1, "p1", "s1", ts("20180602 00:00:00"), 40.0, 4.0),
        ("o4", 1, "p2", "s2", ts("20190202 00:00:00"), 50.0, 5.0),
    ]
    products = [("p1", "cat_a"), ("p2", "cat_b")]
    category = [
        ("cat_a", "toys"),
        ("cat_b", "housewares"),
        # the header row that slipped into the import (Olist DW.sql:62,67)
        ("Product_category_name_english", "Product_category_name_english"),
    ]
    sellers = [
        ("s1", "01001", "city_a", "SP"),
        ("s2", "02002", "city_b", "RJ"),
    ]
    geolocation = [
        ("01001", "city_a", "SP"),
        ("01001", "city_a", "SP"),  # duplicate → DISTINCT must collapse
        ("02002", "city_b", "RJ"),
        ("03003", "city_c", "MG"),
    ]
    leads = [
        ("mql1", ts("20180401 10:00:00"), "organic_search"),
        ("mql2", ts("20180402 10:00:00"), None),
        ("mql3", ts("20180403 10:00:00"), "unknown"),
        ("mql4", ts("20180401 10:00:00"), "paid_search"),
    ]
    closed_deals = [
        ("mql1", "s1", "toys", "online_medium", "reseller", ts("20180403 12:00:00")),
        ("mql2", "s2", "pet_shop", None, None, ts("20180405 12:00:00")),
        ("mql3", "s1", "toys", "online_medium", "reseller", ts("20180406 12:00:00")),
        # sub-hour conversion → avg_hrs_convert = 0 → cleanup DELETE case
        ("mql4", "s2", "pet_shop", "online_big", "reseller", ts("20180401 10:30:00")),
    ]
    mk = spark.createDataFrame
    return {
        "orders": mk(orders, schemas.OLIST_ORDERS),
        "order_items": mk(order_items, schemas.OLIST_ORDER_ITEMS),
        "products": mk(products, schemas.OLIST_PRODUCTS),
        "category": mk(category, schemas.OLIST_CATEGORY),
        "sellers": mk(sellers, schemas.OLIST_SELLERS),
        "geolocation": mk(geolocation, schemas.OLIST_GEOLOCATION),
        "leads": mk(leads, schemas.OLIST_LEADS),
        "closed_deals": mk(closed_deals, schemas.OLIST_CLOSED_DEALS),
    }


# The reference's own ETL smoke-test vectors, verbatim
# (`Olist DW.sql:296-312`): 6 fake 2019 orders + 6 matching items.
FAKE_2019_ORDERS = [
    ("023345456754dfg67875647032168abc", "9ef432eb6251297304e76186b10a928d",
     "delivered", ts("20190101 12:30:00"), ts("20190102 12:30:00"),
     ts("20190103 12:30:00"), ts("20190104 12:30:00"), ts("20190105 12:30:00")),
    ("rsfdgrtgh455643hhtkiusdng2345246", "b0830fb4747a6c6d20dea0b8c802d7ef",
     "delivered", ts("20190102 12:30:00"), ts("20190103 12:30:00"),
     ts("20190104 12:30:00"), ts("20190105 12:30:00"), ts("20190106 12:30:00")),
    ("sdafgfdh45647fgh4564567hge456453", "41ce2a54c0b03bf3443c3d931a367089",
     "delivered", ts("20190103 12:30:00"), ts("20190104 12:30:00"),
     ts("20190105 12:30:00"), ts("20190106 12:30:00"), ts("20190107 12:30:00")),
    ("2343dfg34543g3476jh576682tsrgrfg", "f88197465ea7920adcdbec7375364d82",
     "delivered", ts("20190104 12:30:00"), ts("20190105 12:30:00"),
     ts("20190106 12:30:00"), ts("20190107 12:30:00"), ts("20190108 12:30:00")),
    ("34565467tr453646vbdfg345346dgdrt", "8ab97904e6daea8866dbdbc4fb7aad2c",
     "delivered", ts("20190105 12:30:00"), ts("20190106 12:30:00"),
     ts("20190107 12:30:00"), ts("20190108 12:30:00"), ts("20190201 12:30:00")),
    ("45654ydfgfdg45er65fdgh5664fthb54", "503740e9ca751ccdda7ba28e9ab8f608",
     "delivered", ts("20190106 12:30:00"), ts("20190107 12:30:00"),
     ts("20190108 12:30:00"), ts("20190109 12:30:00"), ts("20190211 12:30:00")),
]

FAKE_2019_ITEMS = [
    ("023345456754dfg67875647032168abc", 1, "4244733e06e7ecb4970a6e2683c13e61",
     "48436dade18ac8b2bce089ec2a041202", ts("20190105 12:30:00"), 58.9, 13.29),
    ("rsfdgrtgh455643hhtkiusdng2345246", 1, "e5f2d52b802189ee658865ca93d83a8f",
     "dd7ddc04e1b6c2c614352b383efe2d36", ts("20190105 12:30:00"), 239.9, 39.0),
    ("sdafgfdh45647fgh4564567hge456453", 1, "c777355d18b72b67abbeef9df44fd0fd",
     "dd7ddc04e1b6c2c614352b383efe2d36", ts("20190105 12:30:00"), 199.0, 17.8),
    ("2343dfg34543g3476jh576682tsrgrfg", 1, "7634da152a4610f1595efa32f14722fc",
     "5b51032eddd242adc84c38acab88f23d", ts("20190105 12:30:00"), 12.99, 12.79),
    ("34565467tr453646vbdfg345346dgdrt", 1, "ac6c3623068f30de03045865e4e10089",
     "9d7a1d34a5052409006425275ba1c2b4", ts("20190105 12:30:00"), 199.9, 11.85),
    ("45654ydfgfdg45er65fdgh5664fthb54", 1, "ef92defde845ab8450f9d70c526ef70f",
     "df560393f3a51e74553ab94004ba5c87", ts("20190105 12:30:00"), 239.9, 11.4),
]

# Catalog rows so the fake items' product/seller ids resolve through the
# star joins (the reference relies on these ids existing in its real
# staging tables).
FAKE_PRODUCTS = [
    ("4244733e06e7ecb4970a6e2683c13e61", "cat_a"),
    ("e5f2d52b802189ee658865ca93d83a8f", "cat_a"),
    ("c777355d18b72b67abbeef9df44fd0fd", "cat_b"),
    ("7634da152a4610f1595efa32f14722fc", "cat_b"),
    ("ac6c3623068f30de03045865e4e10089", "cat_a"),
    ("ef92defde845ab8450f9d70c526ef70f", "cat_b"),
]
FAKE_SELLERS = [
    ("48436dade18ac8b2bce089ec2a041202", "01001", "city_a", "SP"),
    ("dd7ddc04e1b6c2c614352b383efe2d36", "01001", "city_a", "SP"),
    ("5b51032eddd242adc84c38acab88f23d", "02002", "city_b", "RJ"),
    ("9d7a1d34a5052409006425275ba1c2b4", "02002", "city_b", "RJ"),
    ("df560393f3a51e74553ab94004ba5c87", "03003", "city_c", "MG"),
]


def staging_with_fake_2019(spark) -> dict:
    """Staging after the reference's fake-data INSERTs (`:296-312`)."""
    from olist_data_warehouse_spark import schemas as sch

    base = staging(spark)
    mk = spark.createDataFrame
    base["orders"] = base["orders"].unionByName(
        mk(FAKE_2019_ORDERS, sch.OLIST_ORDERS)
    )
    base["order_items"] = base["order_items"].unionByName(
        mk(FAKE_2019_ITEMS, sch.OLIST_ORDER_ITEMS)
    )
    base["products"] = base["products"].unionByName(
        mk(FAKE_PRODUCTS, sch.OLIST_PRODUCTS)
    )
    base["sellers"] = base["sellers"].unionByName(
        mk(FAKE_SELLERS, sch.OLIST_SELLERS)
    )
    return base
