// Stand-in for the CMake-generated export header the reference includes as
// "vbz/vbz_export.h" (generate_export_header(vbz), vbz/CMakeLists.txt:16).
// A static build needs no visibility attributes.
#pragma once
#define VBZ_EXPORT
#define VBZ_NO_EXPORT
#define VBZ_DEPRECATED
