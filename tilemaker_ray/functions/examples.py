"""Example user page-functions (the Lua-profile analog of the
reference's resources/process-openmaptiles.lua) — importable by Ray
workers, usable as templates."""

from __future__ import annotations


def poi_function(page):
    """POIs from geo positions, routes from tracks, building centroids
    from footprints — exercises most of the UDF API surface."""
    if not page.HasTags():
        return
    p = page.FirstPosition()
    if p is None:
        if page.Holds("geo.track"):
            page.Layer("route")
            page.Attribute("len_m", int(page.Length()))
            page.MinZoom(9)
        elif page.Holds("geo.footprint"):
            page.LayerAsCentroid("building_center")
            page.Attribute("area_m2", int(page.Area()))
            page.MinZoom(11)
        return
    covering = page.FindCovering("admin")
    page.Layer("poi", point=(p[1], p[0]))
    page.Attribute("name", page.Slug())
    page.Attribute("lang", page.Lang())
    if covering:
        page.Attribute("admin", covering[0])
    page.MinZoom(8)
    page.ZOrder(5)
