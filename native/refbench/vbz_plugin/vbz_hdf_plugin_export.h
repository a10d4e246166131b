// Stand-in for the CMake-generated export header of the reference's HDF5
// plugin (generate_export_header(vbz_hdf_plugin), vbz_plugin/CMakeLists.txt).
#pragma once
#define VBZ_HDF_PLUGIN_EXPORT __attribute__((visibility("default")))
#define VBZ_HDF_PLUGIN_NO_EXPORT
#define VBZ_HDF_PLUGIN_DEPRECATED
